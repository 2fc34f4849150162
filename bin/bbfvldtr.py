#!/usr/bin/env python
"""bin/bbfvldtr.rb twin: CMU-annotation face-detection rate.

    bbfvldtr.py <cmu-truth-file> <estimate-file>

Truth lines: "<image> lx ly rx ry nx ny lmx lmy cmx cmy rmx rmy" (the six
face landmarks). Estimate lines: "<image> <x> <y> <width> <height>".
A detection is a true positive when all six landmarks fall inside the
1.5x-relaxed box (bbfvldtr.rb:31-58). Prints "RATE% (FA)".
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ccv_tpu.utils.deteval import cmu_face_score

KEYS = ("left_eye", "right_eye", "nose", "left_mouth", "center_mouth",
        "right_mouth")


def main():
    assert len(sys.argv) == 3, __doc__
    truth = {}
    for line in open(sys.argv[1]):
        args = line.split()
        if len(args) < 13:
            continue
        name = args[0].split(".")[0].lower()
        vals = [float(v) for v in args[1:13]]
        truth.setdefault(name, []).append(
            {k: dict(x=vals[2 * i], y=vals[2 * i + 1])
             for i, k in enumerate(KEYS)})
    est = {}
    for line in open(sys.argv[2]):
        args = line.split()
        if len(args) < 5:
            continue
        name = args[0].split(".")[0].lower()
        est.setdefault(name, []).append(dict(
            x=float(args[1]), y=float(args[2]),
            width=float(args[3]), height=float(args[4])))
    tp, fa, total = cmu_face_score(truth, est)
    print(f"{round(tp / max(total, 1) * 10000) / 100.0}% ({fa})")


if __name__ == "__main__":
    main()
