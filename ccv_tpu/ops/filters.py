"""Separable-filter building blocks shared by the image primitives.

All helpers operate on arrays shaped ``(..., H, W, C)`` (channels-last, any
leading batch dims) so every primitive is batchable / vmap-able by
construction — the TPU-native answer to the reference's per-image scalar
loops. Integer inputs stay in integer arithmetic so the common 8U/32S paths
reproduce the reference bit-exactly (lib/ccv_basic.c uses int paths with
``ccv_descale``-style shifts).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def to_hwc(x):
    """Normalize (H, W) -> (H, W, 1); returns (array, had_channels)."""
    if x.ndim == 2:
        return x[..., None], False
    return x, True


def from_hwc(x, had_channels: bool):
    return x if had_channels else x[..., 0]


def edge_pad(x, before: int, after: int, axis: int):
    """Replicate-pad along one axis (ccv's border handling)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (before, after)
    return jnp.pad(x, pad, mode="edge")


def correlate1d(x, taps: Sequence, axis: int, shift: int = 0):
    """Correlate with an explicit tap list along ``axis``, replicate-padded.

    Centered window of size ``len(taps)`` with center ``len(taps)//2``.
    ``shift``: arithmetic right-shift applied to integer accumulations
    (twin of _ccv_set_32s_value_1, lib/ccv_internal.h:256).
    """
    taps = list(taps)
    fsz = len(taps)
    hfz = fsz // 2
    xp = edge_pad(x, hfz, fsz - 1 - hfz, axis)
    is_int = jnp.issubdtype(x.dtype, jnp.integer)
    # integer path computed in f32: exact while |acc| < 2^24 (all our tap
    # sets keep 8U accumulations under 2^24), and ~10x faster than int32
    # multiplies on the TPU VPU. The arithmetic right shift is
    # floor(x / 2^s), which jnp.floor reproduces for negatives too.
    acc_dtype = jnp.float32 if is_int else x.dtype
    acc = None
    for k, t in enumerate(taps):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, k + x.shape[axis])
        term = xp[tuple(sl)].astype(acc_dtype) * jnp.asarray(t, acc_dtype)
        acc = term if acc is None else acc + term
    if is_int:
        if shift:
            acc = jnp.floor(acc * (2.0 ** -shift))
        acc = acc.astype(jnp.int32)
    return acc


def min_filter1d(x, fsz: int, axis: int):
    """Running-min window of ``fsz`` (center fsz//2), replicate-padded."""
    hfz = fsz // 2
    xp = edge_pad(x, hfz, fsz - 1 - hfz, axis)
    out = None
    for k in range(fsz):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, k + x.shape[axis])
        v = xp[tuple(sl)]
        out = v if out is None else jnp.minimum(out, v)
    return out


def max_filter1d(x, fsz: int, axis: int):
    hfz = fsz // 2
    xp = edge_pad(x, hfz, fsz - 1 - hfz, axis)
    out = None
    for k in range(fsz):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, k + x.shape[axis])
        v = xp[tuple(sl)]
        out = v if out is None else jnp.maximum(out, v)
    return out


def gaussian_taps(sigma: float, fsz: int) -> np.ndarray:
    """Unnormalized Gaussian taps, center fsz//2."""
    hfz = fsz // 2
    i = np.arange(fsz, dtype=np.float64)
    return np.exp(-((i - hfz) ** 2) / (2.0 * sigma * sigma))
