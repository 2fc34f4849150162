#!/usr/bin/env python
"""bin/siftmatch twin: siftmatch.py <object image> <scene image>"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ccv_tpu.core.io import read, IO_GRAY
from ccv_tpu.detectors import sift


def main():
    assert len(sys.argv) >= 3, __doc__
    obj = read(sys.argv[1], IO_GRAY)
    scene = read(sys.argv[2], IO_GRAY)
    t0 = time.time()
    k1, d1 = sift.sift(obj.array)
    k2, d2 = sift.sift(scene.array)
    idx, ok = sift.match(d1, d2)
    elapsed = int((time.time() - t0) * 1000)
    for i, (j, m) in enumerate(zip(idx, ok)):
        if m:
            a, b = k1[i], k2[int(j)]
            print(f"{a['x']:.2f} {a['y']:.2f} => {b['x']:.2f} {b['y']:.2f}")
    print(f"{int(ok.sum())} keypoints out of {len(k1)} are matched")
    print(f"elpased time : {elapsed}")


if __name__ == "__main__":
    main()
