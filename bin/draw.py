#!/usr/bin/env python
"""Generic draw twin of bbfdraw.rb / swtdraw.rb / dpmdraw.rb / icfdraw.rb:
overlay detector output rectangles on an image.

    <detector>.py <image> ... | draw.py <image> <out.png>

Reads "x y width height ..." lines from stdin (the detect tools' output
format; the trailing "total : N ..." line is passed through), draws a
3-pixel white rectangle per rect, and writes the annotated image.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    assert len(sys.argv) >= 3, __doc__
    from ccv_tpu.core import dense_matrix
    from ccv_tpu.core.io import read, write, IO_RGB_COLOR

    img = np.array(read(sys.argv[1], IO_RGB_COLOR).numpy())
    H, W = img.shape[0], img.shape[1]
    for line in sys.stdin:
        print(line, end="")
        args = line.split()
        if not args or args[0] in ("total", "elapsed", "elpased"):
            continue
        try:
            x, y, w, h = (int(float(v)) for v in args[:4])
        except ValueError:
            continue
        x0, y0 = max(x, 0), max(y, 0)
        x1, y1 = min(x + w, W - 1), min(y + h, H - 1)
        for t in range(3):
            if y0 + t < H:
                img[y0 + t, x0:x1 + 1] = 255
            if y1 - t >= 0:
                img[y1 - t, x0:x1 + 1] = 255
            if x0 + t < W:
                img[y0:y1 + 1, x0 + t] = 255
            if x1 - t >= 0:
                img[y0:y1 + 1, x1 - t] = 255
    write(dense_matrix.from_numpy(img), sys.argv[2])


if __name__ == "__main__":
    main()
