#!/usr/bin/env python
"""bin/kmeans1d twin: micro-benchmark of the exact 1-D k-means
(reference: bin/kmeans1d.c — 1M uniform points into 128 clusters)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    from ccv_tpu.core.numeric import kmeans1d

    rng = np.random.default_rng(0)
    a = rng.uniform(0.0, 1.0, n).astype(np.float32)
    t0 = time.time()
    clusters, centroids = kmeans1d(a, k)
    elapsed = (time.time() - t0) * 1000
    print(f"elapsed: {elapsed:.0f}ms")
    assert len(centroids) == k
    return elapsed


if __name__ == "__main__":
    main()
