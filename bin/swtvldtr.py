#!/usr/bin/env python
"""bin/swtvldtr.rb twin: DetEval precision/recall for text detection.

    swtvldtr.py <truth-file> <estimate-file>

Both files use the rb format: a filename line followed by one "x y w h"
line per rect. Prints the same three lines as the reference tool.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ccv_tpu.utils.deteval import deteval, parse_rect_file


def main():
    assert len(sys.argv) == 3, __doc__
    truth = parse_rect_file(sys.argv[1])
    estimate = parse_rect_file(sys.argv[2])
    precision, recall = deteval(truth, estimate)
    hmean = (2.0 * precision * recall / (precision + recall)
             if precision + recall else 0.0)
    print(f"precision: {round(precision * 10000) / 100}%")
    print(f"recall: {round(recall * 10000) / 100}%")
    print(f"harmonic mean: {round(hmean * 10000) / 100}%")


if __name__ == "__main__":
    main()
