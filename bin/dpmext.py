#!/usr/bin/env python
"""bin/dpmext twin: extract PASCAL-VOC annotation directories into the
``name x y width height`` list format dpmcreate consumes
(reference: bin/dpmext.rb).

    dpmext.py VOCdevkit/VOC2007/Annotations_txt/ > train.list
"""

import glob
import os
import re
import sys

_NAME = re.compile(r'Image filename', re.IGNORECASE)
_BOX = re.compile(r'Bounding box for', re.IGNORECASE)
_COORD = re.compile(r"\((\d+),\s*(\d+)\)\s*-\s*\((\d+),\s*(\d+)\)")
_OBJ = re.compile(r"object\s*(\d+)")


def extract(path: str):
    """One annotation file -> list of (image_name, x, y, w, h)."""
    name = None
    boxes = {}
    with open(path, errors="replace") as f:
        for line in f:
            if line.startswith("#"):
                continue
            if _NAME.match(line[:14]):
                # image filename : "VOC2007/JPEGImages/000012.jpg"
                name = line[line.rindex("/") + 1:line.rindex('"')]
            elif _BOX.match(line[:16]):
                i = int(_OBJ.search(line).group(1))
                x0, y0, x1, y1 = (int(v) for v in _COORD.search(line).groups())
                boxes[i] = (x0, y0, x1 - x0, y1 - y0)
    return [(name, *boxes[i]) for i in sorted(boxes)]


def main():
    assert len(sys.argv) == 2, __doc__
    n = 0
    for path in sorted(glob.glob(os.path.join(sys.argv[1], "*.txt"))):
        for name, x, y, w, h in extract(path):
            print(f"{name} {x} {y} {w} {h}")
            n += 1
    return n


if __name__ == "__main__":
    main()
