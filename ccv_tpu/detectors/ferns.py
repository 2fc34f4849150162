"""Random ferns classifier (reference: lib/ccv_ferns.c), used by TLD.

A fern hashes `features` pairwise pixel comparisons into a leaf index;
per-leaf class posteriors are updated online (semi-naive Bayes). The TPU
twin evaluates all ferns of all patches at once: the comparisons are two
gathers + a bit-pack matmul, prediction is a posterior table lookup + sum.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Ferns:
    structs: int
    features: int
    scales: int
    # (scales, structs, features, 2, 2) as (point index -> (x, y))
    points: np.ndarray
    posterior: np.ndarray   # (structs, 2**features, 2) log posteriors
    rnum: np.ndarray        # (structs, 2**features, 2) observation counts
    cnum: np.ndarray        # (2,) class counts
    threshold: float = 0.0

    @property
    def posteriors(self) -> int:
        return 1 << self.features


def ferns_new(structs: int, features: int, sizes: Sequence[Tuple[int, int]],
              seed: int = 0) -> Ferns:
    """ccv_ferns_new twin: random axis-restricted point pairs per scale.

    sizes: list of (width, height) per scale."""
    scales = len(sizes)
    rng = np.random.default_rng(seed)
    points = np.zeros((scales, structs, features, 2, 2), np.int32)
    for i in range(structs):
        for k in range(features):
            if rng.integers(0, 2):
                while True:
                    x1f, x2f = rng.random(), rng.random()
                    y1f = y2f = rng.random()
                    if abs(x1f - x2f) < 0.2:
                        break
            else:
                while True:
                    x1f = x2f = rng.random()
                    y1f, y2f = rng.random(), rng.random()
                    if abs(y1f - y2f) < 0.2:
                        break
            for j, (w, h) in enumerate(sizes):
                points[j, i, k, 0] = (int(x1f * w), int(y1f * h))
                points[j, i, k, 1] = (int(x2f * w), int(y2f * h))
    posteriors = 1 << features
    return Ferns(structs=structs, features=features, scales=scales,
                 points=points,
                 posterior=np.full((structs, posteriors, 2), np.log(0.5),
                                   np.float32),
                 rnum=np.zeros((structs, posteriors, 2), np.int64),
                 cnum=np.zeros(2, np.int64))


def ferns_feature(ferns: Ferns, patch, scale: int) -> np.ndarray:
    """ccv_ferns_feature twin: (structs,) leaf indices for one patch.
    Vectorized: one gather per point set + bit packing."""
    a = jnp.asarray(patch)
    if a.ndim == 3:
        a = a[..., 0]
    pts = ferns.points[scale]  # (structs, features, 2, 2)
    H, W = a.shape
    x = np.clip(pts[..., 0], 0, W - 1)
    y = np.clip(pts[..., 1], 0, H - 1)
    vals = np.asarray(a)[y, x]  # (structs, features, 2)
    bits = (vals[..., 0] > vals[..., 1]).astype(np.uint32)
    weights = (1 << np.arange(ferns.features - 1, -1, -1)).astype(np.uint32)
    return (bits * weights).sum(-1).astype(np.uint32)


def ferns_correct(ferns: Ferns, fern: np.ndarray, c: int, repeat: int = 0):
    """ccv_ferns_correct twin: online posterior update."""
    repeat += 1
    ferns.cnum[c] += repeat
    cw = 1.0 / (ferns.cnum + 1)
    for i in range(ferns.structs):
        k = int(fern[i])
        ferns.rnum[i, k, c] += repeat
        rcw0 = ferns.rnum[i, k, 0] * cw[0] + 1e-5
        rcw1 = ferns.rnum[i, k, 1] * cw[1] + 1e-5
        ferns.posterior[i, k, 0] = np.log(rcw0 / (rcw0 + rcw1))
        ferns.posterior[i, k, 1] = np.log(rcw1 / (rcw0 + rcw1))


def ferns_predict(ferns: Ferns, fern: np.ndarray) -> float:
    """ccv_ferns_predict twin: vote margin (class 1 - class 0)."""
    idx = np.arange(ferns.structs)
    votes = ferns.posterior[idx, fern.astype(np.int64)]
    return float(votes[:, 1].sum() - votes[:, 0].sum())
