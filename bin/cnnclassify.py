#!/usr/bin/env python
"""bin/cnnclassify twin: cnnclassify.py <image> <model.sqlite3>

Loads a ccv_tpu VGG-D checkpoint (SQLite tensors format) and prints the
top-5 class ids + confidences like the reference tool."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from ccv_tpu.core.io import read, IO_RGB_COLOR
from ccv_tpu.models import vgg


def main():
    assert len(sys.argv) >= 3, __doc__
    image = read(sys.argv[1], IO_RGB_COLOR)
    model = vgg.vgg_d()
    model.build((1, 224, 224, 3), key=jax.random.PRNGKey(0))
    try:
        model.read(sys.argv[2])
    except Exception as e:  # noqa: BLE001 - fall back to random init
        print(f"(warning: could not load weights: {e}; using random init)",
              file=sys.stderr)
    t0 = time.time()
    idx, probs = vgg.classify(model, image.array)
    elapsed = int((time.time() - t0) * 1000)
    parts = [f"{int(i) + 1} {float(p):.6f}" for i, p in zip(idx[0], probs[0])]
    print(f"{' | '.join(parts)} | {elapsed}ms")


if __name__ == "__main__":
    main()
