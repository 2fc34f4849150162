#!/usr/bin/env python
"""bin/aflw twin: AFLW face-crop dataset preparation
(reference: bin/aflw.c).

Reads annotation lines ``file x y width height roll pitch yaw`` (radians,
aflw.c:46), keeps near-frontal faces (|pitch|,|roll| < 22.5deg, |yaw| < 20deg,
size >= 15px — aflw.c:48-52), random-deforms each square crop (scale in
[1/(1+s), 1+s] evenly distributed around 1, shift up to 5% — aflw.c:15-22),
resamples to 48x48 (CUBIC when upscaling, AREA when downscaling —
aflw.c:25-28) and writes ``aflw-NNNNNNN-bw.png`` + ``-rgb.png`` pairs.

    aflw.py annotations.txt image_dir/ out_dir/
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

SIZE = 48
DEFORM_ANGLE = 10      # accepted for parity; unused, like the reference
DEFORM_SCALE = 0.1
DEFORM_SHIFT = 0.05


def slice_with_rect(rng, image, rect, size=SIZE,
                    deform_scale=DEFORM_SCALE, deform_shift=DEFORM_SHIFT):
    """aflw.c:10-31 `_ccv_aflw_slice_with_rect`: random scale/shift deform
    of a square crop, resampled to (size, size)."""
    from ccv_tpu.core.util import slice_
    from ccv_tpu.ops import resample

    x, y, w, h = rect
    assert w == h, "aflw rects are square"
    # evenly distributed scale around 1 (aflw.c:17 comment)
    u = rng.uniform()
    scale = (1 + deform_scale * u) / (1 + deform_scale * (1 - u))
    new_w = int(w * scale + 0.5)
    new_h = int(h * scale + 0.5)
    ox = int((deform_shift * 2 * rng.uniform() - deform_shift) * w + 0.5
             + (w - new_w) * 0.5)
    oy = int((deform_shift * 2 * rng.uniform() - deform_shift) * h + 0.5
             + (h - new_h) * 0.5)
    crop = slice_(image, y + oy, x + ox, h, w)
    interp = (resample.INTER_CUBIC if size > w else resample.INTER_AREA)
    return resample.resample(crop, rows=size, cols=size,
                             rows_scale=size / crop.shape[0],
                             cols_scale=size / crop.shape[1], interp=interp)


def frontal(roll: float, pitch: float, yaw: float, w: int, h: int) -> bool:
    """aflw.c:48-52 near-frontal filter."""
    lim = math.pi * 22.5 / 180
    ylim = math.pi * 20 / 180
    return (abs(pitch) < lim and abs(roll) < lim and abs(yaw) < ylim
            and w >= 15 and h >= 15)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("annotations")
    ap.add_argument("image_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from ccv_tpu.core.io import read, write, IO_GRAY, IO_RGB_COLOR

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    i = 0
    with open(args.annotations) as r:
        for line in r:
            parts = line.split()
            if len(parts) != 8:
                continue
            fname = parts[0]
            x, y, w, h = (int(v) for v in parts[1:5])
            roll, pitch, yaw = (float(v) for v in parts[5:8])
            if not frontal(roll, pitch, yaw, w, h):
                continue
            path = os.path.join(args.image_dir, fname)
            for suffix, flag in (("bw", IO_GRAY), ("rgb", IO_RGB_COLOR)):
                img = read(path, flag).numpy()
                b = slice_with_rect(rng, img, (x, y, w, h))
                out = os.path.join(args.out_dir,
                                   f"aflw-{i:07d}-{suffix}.png")
                write(np.asarray(b), out)
            i += 1
    print(f"wrote {i} crops to {args.out_dir}")
    return i


if __name__ == "__main__":
    main()
