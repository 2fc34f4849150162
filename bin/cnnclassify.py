#!/usr/bin/env python
"""bin/cnnclassify twin: cnnclassify.py <image> <model.sqlite3>

Accepts either a reference ccv_convnet SQLite model (layer_params/
layer_data schema, e.g. image-net-2012.sqlite3 — ccv_convnet.c:1412) or a
ccv_tpu VGG-D checkpoint (SQLite tensors format), auto-detected by schema.
Prints top-5 "<class-id> <confidence>" like the reference tool. A model
that fails to load is an ERROR — there is no random-weights fallback.
"""

import sqlite3
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _is_convnet_schema(path: str) -> bool:
    con = sqlite3.connect(path)
    try:
        names = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
    finally:
        con.close()
    return "layer_params" in names and "layer_data" in names


def main():
    assert len(sys.argv) >= 3, __doc__
    from ccv_tpu.core.io import read, IO_RGB_COLOR

    image = read(sys.argv[1], IO_RGB_COLOR)
    if _is_convnet_schema(sys.argv[2]):
        from ccv_tpu.models.convnet import Convnet

        net = Convnet.read(sys.argv[2])
        t0 = time.time()
        ranks = net.classify(image.numpy(), tops=5)
        elapsed = int((time.time() - t0) * 1000)
        parts = [f"{i + 1} {c:.6f}" for i, c in ranks]
    else:
        import jax

        from ccv_tpu.models import vgg

        model = vgg.vgg_d()
        model.build((1, 224, 224, 3), key=jax.random.PRNGKey(0))
        model.read(sys.argv[2])  # raises on failure: no silent fallback
        t0 = time.time()
        idx, probs = vgg.classify(model, image.array)
        elapsed = int((time.time() - t0) * 1000)
        parts = [f"{int(i) + 1} {float(p):.6f}"
                 for i, p in zip(idx[0], probs[0])]
    print(f"{' | '.join(parts)} | {elapsed}ms")


if __name__ == "__main__":
    main()
