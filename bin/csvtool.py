#!/usr/bin/env python
"""bin/nnc/csv twin (reference: bin/nnc/csv.c): parse a CSV into a
dataframe, iterate every row, and print the timings.

    csvtool.py <file.csv>
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    assert len(sys.argv) >= 2, __doc__
    from ccv_tpu.nn.dataframe import Dataframe

    t0 = time.time()
    df = Dataframe.from_csv(sys.argv[1], header=False)
    cols = df.columns
    print(f"Dataframe.from_csv {int((time.time() - t0) * 1000)} ms "
          f"({df.n} rows x {len(cols)} columns)")
    t0 = time.time()
    n = 0
    for _row in df.iter(cols, batch_size=1, device_put=False):
        n += 1
    print(f"iter_next {int((time.time() - t0) * 1000)} ms ({n} rows)")


if __name__ == "__main__":
    main()
