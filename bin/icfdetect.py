#!/usr/bin/env python
"""bin/icfdetect twin: icfdetect.py <image> <cascade.icf>"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ccv_tpu.core.io import read, IO_RGB_COLOR
from ccv_tpu.detectors import icf


def main():
    assert len(sys.argv) >= 3, __doc__
    image = read(sys.argv[1], IO_RGB_COLOR)
    cascade = icf.load_cascade(sys.argv[2])
    t0 = time.time()
    seq = icf.detect_objects(image.array, cascade)
    elapsed = int((time.time() - t0) * 1000)
    for c in seq:
        print(f"{int(c.x)} {int(c.y)} {int(c.width)} {int(c.height)} {c.confidence:f}")
    print(f"total : {len(seq)} in time {elapsed}ms")


if __name__ == "__main__":
    main()
