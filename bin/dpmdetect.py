#!/usr/bin/env python
"""bin/dpmdetect twin: dpmdetect.py <image> <model.m>

Runs the DPM mixture model and prints one rect + confidence per line,
like the reference tool (bin/dpmdetect.c)."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    assert len(sys.argv) >= 3, __doc__
    from ccv_tpu.core.io import read, IO_RGB_COLOR
    from ccv_tpu.detectors import dpm

    image = read(sys.argv[1], IO_RGB_COLOR)
    model = dpm.read_mixture_model(sys.argv[2])
    dpm.detect(image.array, model)  # warmup/compile
    t0 = time.time()
    seq = dpm.detect(image.array, model)
    elapsed = int((time.time() - t0) * 1000)
    for comp in seq:
        print(f"{comp.x} {comp.y} {comp.width} {comp.height} "
              f"{comp.confidence:f}")
        for part in comp.parts:
            print(f"| {part.x} {part.y} {part.width} {part.height} "
                  f"{part.confidence:f}")
    print(f"total : {len(seq)} in time {elapsed}ms")


if __name__ == "__main__":
    main()
