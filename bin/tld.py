#!/usr/bin/env python
"""bin/tld twin: tld.py <frame0.png> <frame1.png> [...] x y w h

The reference reads a video via libavcodec; this twin takes an ordered
list of frame images. Prints one tracked rect per frame like the
reference tool (bin/tld.c)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    assert len(sys.argv) >= 7, __doc__
    *frames, x, y, w, h = sys.argv[1:]
    box = (int(x), int(y), int(w), int(h))
    from ccv_tpu.core.io import read, IO_GRAY
    from ccv_tpu.detectors import tld

    imgs = [np.asarray(read(f, IO_GRAY).numpy()) for f in frames]
    print(f"{0:05d}: {box[0]} {box[1]} {box[2]} {box[3]} 1.000000")
    tracker = tld.Tld(imgs[0], box)
    for i in range(1, len(imgs)):
        info = tld.TldInfo()
        nb, conf = tracker.track_object(imgs[i - 1], imgs[i], info)
        if nb is None:
            print(f"{i:05d}: --------------")
        else:
            print(f"{i:05d}: {nb[0]} {nb[1]} {nb[2]} {nb[3]} {conf:f}")


if __name__ == "__main__":
    main()
