#!/usr/bin/env python
"""bin/icfvldtr.rb twin — identical protocol to dpmvldtr (Pascal-VOC
annotations, intersection > 0.5 * max-area matching).

    icfvldtr.py <voc-annotation-dir> <estimate-file>
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import importlib

dpmvldtr = importlib.import_module("dpmvldtr")

if __name__ == "__main__":
    dpmvldtr.main()
