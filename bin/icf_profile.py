"""ICF on-chip bisect: measure detect() with each SAT form + stage timings.

VERDICT r3 flagged ICF regressing 43.3 -> 57.9 ms between rounds and
suspected the sat_auto routing (under tracing it defaults to sat_mxu
without measuring). This driver measures the full detect with each form
forced, plus the standalone SAT forms at ICF's channel-plane shape.

Usage: python bin/icf_profile.py [--form sat|sat_mxu|default]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(form: str, steps: int = 10) -> dict:
    import jax

    from ccv_tpu.core import algebra
    from ccv_tpu.core.io import read, IO_RGB_COLOR
    from ccv_tpu.detectors import icf

    if form == "sat":
        algebra.sat_auto = lambda a, padding=algebra.NO_PADDING: \
            algebra.sat(a, padding)
    elif form == "sat_mxu":
        algebra.sat_auto = lambda a, padding=algebra.NO_PADDING: \
            algebra.sat_mxu(a, padding)

    img = read("/root/reference/samples/pedestrian.png", IO_RGB_COLOR)
    casc = icf.load_cascade("/root/reference/samples/pedestrian.icf")

    t0 = time.perf_counter()
    dets = icf.detect_objects(img.array, casc)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(steps):
        dets = icf.detect_objects(img.array, casc)
        jax.block_until_ready(dets) if hasattr(dets, "block_until_ready") \
            else None
    ms = (time.perf_counter() - t0) / steps * 1e3
    return {"form": form, "ms_per_image": round(ms, 2),
            "warm_s": round(warm, 1), "detections": len(dets)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--form", default="default",
                    choices=["sat", "sat_mxu", "default"])
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    print(json.dumps(run(args.form, args.steps)))


if __name__ == "__main__":
    main()
