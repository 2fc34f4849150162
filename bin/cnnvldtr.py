#!/usr/bin/env python
"""bin/cnnvldtr.rb twin: top-1/top-5 missing rates for cnnclassify output.

    cnnvldtr.py <truth-file> <result-file>

<truth-file>: one class id per line. <result-file>: cnnclassify output,
"id conf id conf ..." per line. Prints "M1% (1), M5% (5)".
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ccv_tpu.utils.deteval import topk_miss


def main():
    assert len(sys.argv) == 3, __doc__
    truth = [int(line.split()[0]) for line in open(sys.argv[1])
             if line.strip()]
    ranks = []
    for line in open(sys.argv[2]):
        toks = line.split()
        if not toks or toks[0] == "elapsed":
            continue
        ranks.append([int(t) for t in toks[0::2][:5]])
    m1, m5 = topk_miss(truth, ranks)
    print(f"{round(m1 * 10000) / 100.0}% (1), {round(m5 * 10000) / 100.0}% (5)")


if __name__ == "__main__":
    main()
