#!/usr/bin/env python
"""bin/bbfdetect twin: bbfdetect.py <image> <cascade directory>"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ccv_tpu.core.io import read, IO_GRAY
from ccv_tpu.detectors import bbf


def main():
    assert len(sys.argv) >= 3, __doc__
    image = read(sys.argv[1], IO_GRAY)
    cascade = bbf.load_cascade(sys.argv[2])
    t0 = time.time()
    seq = bbf.detect_objects(image.array, cascade)
    elapsed = int((time.time() - t0) * 1000)
    for c in seq:
        print(f"{int(c.x)} {int(c.y)} {int(c.width)} {int(c.height)} {c.confidence:f}")
    print(f"total : {len(seq)} in time {elapsed}ms")


if __name__ == "__main__":
    main()
