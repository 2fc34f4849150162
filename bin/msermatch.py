#!/usr/bin/env python
"""bin/msermatch twin: msermatch.py <image> [out.png]

Canny -> close_outline as the MSER mask, then masked MSER; prints the
region count like the reference tool (bin/msermatch.c)."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    assert len(sys.argv) >= 2, __doc__
    from ccv_tpu.core.io import read, IO_GRAY
    from ccv_tpu.detectors import mser
    from ccv_tpu.ops import classic

    gray = read(sys.argv[1], IO_GRAY)
    g = np.asarray(gray.numpy())
    t0 = time.time()
    canny = np.asarray(classic.canny(g, 3, 175, 320))
    outline = np.asarray(classic.close_outline(canny))
    params = mser.MserParams(
        min_area=60, max_area=int(g.shape[0] * g.shape[1] * 0.3 + 0.5),
        min_diversity=0.2, delta=5, max_variance=0.25,
        direction=mser.DARK_TO_BRIGHT)
    kps, labels = mser.mser(g, h=outline, params=params)
    elapsed = int((time.time() - t0) * 1000)
    print(f"total : {len(kps)} in time {elapsed}ms")
    if len(sys.argv) >= 3:
        from ccv_tpu.core import io as cio

        colors = np.array([[0, 0, 255], [0, 255, 0], [255, 0, 0],
                           [255, 255, 0], [255, 0, 255], [0, 255, 255]],
                          np.uint8)
        rgb = np.stack([g] * 3, -1)
        m = labels > 0
        rgb[m] = colors[(labels[m] - 1) % 6]
        cio.write(rgb, sys.argv[2])


if __name__ == "__main__":
    main()
