#!/usr/bin/env python
"""bin/dpmvldtr.rb twin: Pascal-VOC-annotation detection rate.

    dpmvldtr.py <voc-annotation-dir> <estimate-file>

<voc-annotation-dir> holds Pascal-VOC .txt annotations ("Image filename"
+ "Bounding box for object N" lines). <estimate-file> lines are
"<image> <x> <y> <width> <height> [conf]" (`|`-prefixed lines skipped).
Matching: intersection > 0.5 * max(areas), duplicates ignored — the
reference's criterion (dpmvldtr.rb:54-66). Prints "RATE% (FA)".
"""

import glob
import os
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ccv_tpu.utils.deteval import overlap_score


def parse_voc_dir(d):
    truth = {}
    for path in glob.glob(os.path.join(d, "*.txt")):
        name = None
        boxes = []
        for line in open(path):
            if line.startswith("#"):
                continue
            if line[:14].lower() == "image filename":
                name = line[line.rindex("/") + 1:line.rindex('"')]
            if line[:16].lower() == "bounding box for":
                i = int(re.search(r"object\s*(\d+)", line).group(1))
                c = re.search(r"\((\d+),\s*(\d+)\)\s*-\s*\((\d+),\s*(\d+)\)",
                              line)
                x0, y0, x1, y1 = (int(c.group(k)) for k in range(1, 5))
                while len(boxes) < i:
                    boxes.append(None)
                boxes[i - 1] = dict(x=x0, y=y0, width=x1 - x0, height=y1 - y0)
        truth[name] = [b for b in boxes if b]
    return truth


def parse_estimates(path):
    out = {}
    for line in open(path):
        if line.startswith("|") or not line.strip():
            continue
        args = line.split()
        name = args[0].rsplit("/", 1)[-1]
        out.setdefault(name, []).append(dict(
            x=int(float(args[1])), y=int(float(args[2])),
            width=int(float(args[3])), height=int(float(args[4]))))
    return out


def main():
    assert len(sys.argv) == 3, __doc__
    truth = parse_voc_dir(sys.argv[1])
    est = parse_estimates(sys.argv[2])
    tp, fa, total = overlap_score(truth, est)
    print(f"{round(tp / max(total, 1) * 10000) / 100.0}% ({fa})")


if __name__ == "__main__":
    main()
