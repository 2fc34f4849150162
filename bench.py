"""North-star benchmark: megapixels/sec/chip through pyramid + face detect.

Runs the SCD face-detect pipeline (octave+interval pyramid -> 11-channel
SURF map -> SAT -> batched cascade over every sliding window) on the real
TPU chip and reports sustained throughput.

Baseline: the reference's C scddetect on this machine's CPU processed
street.png (640x480 = 0.307 MP) in ~249 ms single-image => ~1.23 MP/s
(consistent with doc/scd.rst's 381 ms on a smaller grayscale image).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

# ensure the real device (the session exports JAX_PLATFORMS=axon for TPU)
os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))

import numpy as np

REFERENCE_CPU_MPS = 1.23  # measured: /tmp/refbuild scddetect street.png 249ms


def main():
    import jax

    from ccv_tpu.core.io import read, IO_RGB_COLOR
    from ccv_tpu.detectors import scd

    img_path = "/root/reference/samples/street.png"
    if not os.path.exists(img_path):
        print(json.dumps({"metric": "pyramid+scd_detect", "value": 0.0,
                          "unit": "MP/s/chip", "vs_baseline": 0.0,
                          "error": "sample image missing"}))
        return
    img = read(img_path, IO_RGB_COLOR)
    h, w = img.rows, img.cols
    megapixels = h * w / 1e6
    cascade = scd.load_cascade("/root/reference/samples/face.sqlite3")

    # warmup: compiles every pyramid-level program (persistent cache makes
    # subsequent processes fast)
    for _ in range(2):
        scd.detect(img.array, cascade)

    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = scd.detect(img.array, cascade)
    dt = (time.perf_counter() - t0) / n
    mps = megapixels / dt
    print(json.dumps({
        "metric": "pyramid+scd_detect throughput",
        "value": round(mps, 3),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / REFERENCE_CPU_MPS, 2),
        "detect_ms": round(dt * 1000, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
