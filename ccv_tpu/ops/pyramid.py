"""Image pyramid engine.

Every classic detector in the reference drives the same outer loop — an
octave chain of exact-2x ``ccv_sample_down`` plus fractional ``ccv_resample``
levels within each octave (lib/ccv_scd.c:1667-1700, lib/ccv_bbf.c:1198-1236,
lib/ccv_swt.c:638-652). Here that loop is a single engine: level sizes are
computed on the host (static shapes), every level's resample is an MXU
matmul pair, and all levels stay in HBM — the fused "pyramid build" primitive
the north-star benchmark measures.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ccv_tpu.ops import resample as R


def octave_sizes(h: int, w: int, n_octaves: int) -> List[Tuple[int, int]]:
    sizes = [(h, w)]
    for _ in range(1, n_octaves):
        h, w = h // 2, w // 2
        sizes.append((h, w))
    return sizes


def max_octaves(h: int, w: int, min_h: int, min_w: int) -> int:
    n = 1
    while (h // 2) >= min_h and (w // 2) >= min_w:
        h, w = h // 2, w // 2
        n += 1
    return n


def octave_pyramid(img: jax.Array, n_octaves: int) -> List[jax.Array]:
    """Chain of exact-2x 5-tap downsamples (ccv_sample_down)."""
    levels = [img]
    for _ in range(1, n_octaves):
        levels.append(R.sample_down(levels[-1]))
    return levels


def scale_pyramid(img: jax.Array, scales: Sequence[float],
                  interp: int = R.INTER_AREA) -> List[jax.Array]:
    """Arbitrary-scale pyramid: each level is resample(img, scale)."""
    h = img.shape[-3] if img.ndim >= 3 else img.shape[-2]
    w = img.shape[-2] if img.ndim >= 3 else img.shape[-1]
    out = []
    for s in scales:
        rows = int(h * s + 0.5)
        cols = int(w * s + 0.5)
        out.append(R.resample(img, rows=rows, cols=cols,
                              rows_scale=s, cols_scale=s, interp=interp))
    return out


def interval_pyramid(img: jax.Array, n_octaves: int, n_intervals: int,
                     interp: int = R.INTER_AREA) -> List[List[jax.Array]]:
    """Octaves x intervals grid (the SCD/BBF layout):

    level[o][i] has scale 2^-o * 2^(-i/n_intervals); interval levels are
    resampled once at the top octave then halved exactly down the chain.
    """
    tops = [img]
    for i in range(1, n_intervals):
        s = 2.0 ** (-i / n_intervals)
        h = img.shape[-3] if img.ndim >= 3 else img.shape[-2]
        w = img.shape[-2] if img.ndim >= 3 else img.shape[-1]
        tops.append(R.resample(img, rows=int(h * s + 0.5), cols=int(w * s + 0.5),
                               rows_scale=s, cols_scale=s, interp=interp))
    grid = [tops]
    for _ in range(1, n_octaves):
        grid.append([R.sample_down(lv) for lv in grid[-1]])
    return grid
