#!/usr/bin/env python
"""bin/swtdetect twin: swtdetect.py <image>"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ccv_tpu.core.io import read, IO_GRAY
from ccv_tpu.detectors import swt


def main():
    assert len(sys.argv) >= 2, __doc__
    image = read(sys.argv[1], IO_GRAY)
    swt.detect_words(image.array)  # warmup/compile
    t0 = time.time()
    words = swt.detect_words(image.array)
    elapsed = int((time.time() - t0) * 1000)
    for w in words:
        print(f"{int(w.x)} {int(w.y)} {int(w.width)} {int(w.height)}")
    print(f"total : {len(words)} in time {elapsed}ms")


if __name__ == "__main__":
    main()
