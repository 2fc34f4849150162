"""Fundamental image primitives (reference: lib/ccv_basic.c).

sobel / gradient / flip / blur / erode / dilate, as batched XLA programs on
``(..., H, W, C)`` arrays. Integer input paths reproduce the reference's
fixed-point arithmetic exactly (shifts are arithmetic ``>> n``, truncating,
per lib/ccv_internal.h:256); float paths use the same filters unquantized.

Two API levels:
- ``*_raw``-style jax functions in this module operate on plain arrays
  (jit/vmap friendly).
- the module-level names are wrapped with the transparent memoization cache
  (``ccv_tpu.core.cache.cached_op``) when called with DenseMatrix inputs via
  ``ccv_tpu.compat``.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.ops import filters
from ccv_tpu.ops.filters import correlate1d, to_hwc, from_hwc

CCV_PI = 3.141592653589793

# axis constants for (..., H, W, C)
ROWS, COLS = -3, -2


def _double_borders(x, axis: int):
    """Multiply the first/last slice along ``axis`` by 2 (ccv border rule)."""
    idx_first = [slice(None)] * x.ndim
    idx_first[axis] = slice(0, 1)
    idx_last = [slice(None)] * x.ndim
    idx_last[axis] = slice(x.shape[axis] - 1, x.shape[axis])
    x = x.at[tuple(idx_first)].multiply(2)
    x = x.at[tuple(idx_last)].multiply(2)
    return x


def _sobel_general_taps(fsz: int, as_int: bool):
    """Gaussian-derivative taps for windows >= 5 (lib/ccv_basic.c:196-225)."""
    hfz = fsz // 2
    sigma = ((fsz - 1) / 2) * 0.47 + 0.38
    sigma2 = 2.0 * sigma * sigma
    psigma3 = 2.5 / math.sqrt(math.sqrt(2 * CCV_PI) * sigma * sigma * sigma)
    i = np.arange(fsz, dtype=np.float64)
    df = (i - hfz) * np.exp(-((i - hfz) ** 2) / sigma2) * psigma3
    gf = np.exp(-((i - hfz) ** 2) / sigma2) * psigma3
    if as_int:
        df = np.round(df * 256.0).astype(np.int64)
        gf = np.floor(gf * 256.0 + 0.5).astype(np.int64)
    return df, gf


def sobel(a, dx: int = 1, dy: int = 0, out_float: bool = False):
    """ccv_sobel twin (lib/ccv_basic.c:11).

    dx/dy select the derivative axis and window:
      (1,0)/(0,1): 3-tap central difference with doubled borders;
      (3,0)/(0,3): classic 3x3 Sobel (smooth [1,2,1] x diff [-1,0,1]);
      (n,0)/(0,n) n>=5 odd: separable Gaussian derivative, fixed-point for
      integer outputs (x256 quantized taps, >>8 after each pass).
    Integer inputs produce int32 outputs (bit-exact vs reference) unless
    ``out_float``; float inputs stay float.
    """
    a, had = to_hwc(a)
    is_int_in = jnp.issubdtype(a.dtype, jnp.integer)
    int_path = is_int_in and not out_float
    work = a.astype(jnp.int32 if int_path else jnp.float32)

    if (dx, dy) in ((1, 0), (0, 1)):
        axis = COLS if dx == 1 else ROWS
        out = correlate1d(work, [-1, 0, 1], axis)
        out = _double_borders(out, axis)
    elif (dx, dy) in ((1, 1), (-1, -1), (1, -1), (-1, 1)):
        out = _sobel_diagonal(work, dx, dy)
    elif (dx, dy) in ((3, 0), (0, 3)):
        diff_axis = COLS if dx == 3 else ROWS
        smooth_axis = ROWS if dx == 3 else COLS
        out = correlate1d(work, [1, 2, 1], smooth_axis)
        out = correlate1d(out, [-1, 0, 1], diff_axis)
    else:
        fsz = max(dx, dy)
        assert fsz % 2 == 1, "sobel window must be odd"
        df, gf = _sobel_general_taps(fsz, as_int=int_path)
        shift = 8 if int_path else 0
        # horizontal pass uses the derivative taps when dx >= dy (ccv swaps
        # df/gf when dx < dy, lib/ccv_basic.c:236-241)
        htaps, vtaps = (df, gf) if dx >= dy else (gf, df)
        out = correlate1d(work, htaps, COLS, shift=shift)
        out = correlate1d(out, vtaps, ROWS, shift=shift)
    if not int_path:
        out = out.astype(jnp.float32)
    return from_hwc(out, had)


def _sobel_diagonal(work, dx: int, dy: int):
    """3x3 diagonal difference special cases (lib/ccv_basic.c:65-120).

    (1,1): interior out[i,j] = a[i+1,j+1] - a[i-1,j-1]; first row and first
    column use 2*(a[i+1,j+1]-a[i,j]) (clamped), last row / last column use
    2*(a[i,j]-a[i-1,j-1]) (clamped). (1,-1) mirrors the columns.
    """
    H, W = work.shape[ROWS], work.shape[COLS]
    main_diag = (dx, dy) in ((1, 1), (-1, -1))
    xp = filters.edge_pad(filters.edge_pad(work, 1, 1, ROWS), 1, 1, COLS)

    def shifted(di, dj):
        sl = [slice(None)] * work.ndim
        sl[ROWS] = slice(1 + di, 1 + di + H)
        sl[COLS] = slice(1 + dj, 1 + dj + W)
        return xp[tuple(sl)]

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W, 1), 1)
    first_row, last_row = rows == 0, rows == H - 1
    first_col, last_col = cols == 0, cols == W - 1
    if main_diag:
        fwd, bwd = shifted(1, 1), shifted(-1, -1)
        lead = first_row | first_col   # 2*(fwd - a)
        trail = last_row | last_col    # 2*(a - bwd)
    else:
        fwd, bwd = shifted(1, -1), shifted(-1, 1)
        lead = first_row | last_col
        trail = last_row | first_col
    interior = fwd - bwd
    # first/last-row rules take precedence over column rules (written last
    # in the reference, but rows 0 / H-1 are never re-visited by the
    # middle-row loop) — 'lead' wins at the (0, trailing) corners because
    # the reference writes row 0 with the lead rule across all columns.
    out = jnp.where(trail, 2 * (work - bwd), interior)
    out = jnp.where(lead, 2 * (fwd - work), out)
    # except the bottom row always uses the trail rule, even at lead columns
    out = jnp.where(last_row, 2 * (work - bwd), out)
    return out


def _fast_atan2(x, y):
    """OpenCV-style fast atan2 in degrees [0, 360) (lib/ccv_basic.c:283-343)."""
    x2 = x * x
    y2 = y * y
    eps = jnp.float32(1e-6)
    c = jnp.float32(0.28)
    a_lo = x * y / (x2 + c * y2 + eps) + jnp.where(
        x < 0, jnp.float32(CCV_PI), jnp.where(y >= 0, 0.0, jnp.float32(2 * CCV_PI))
    )
    a_hi = jnp.where(y >= 0, jnp.float32(CCV_PI * 0.5), jnp.float32(CCV_PI * 1.5)) - x * y / (
        y2 + c * x2 + eps
    )
    a = jnp.where(y2 <= x2, a_lo, a_hi)
    return a * jnp.float32(180.0 / CCV_PI)


def gradient(a, dx: int = 1, dy: int = 1):
    """ccv_gradient twin: returns (theta_degrees, magnitude) float32."""
    gx = sobel(a, dx, 0, out_float=True)
    gy = sobel(a, 0, dy, out_float=True)
    theta = _fast_atan2(gx, gy)
    mag = jnp.sqrt(gx * gx + gy * gy)
    return theta, mag


FLIP_X = 0x01  # horizontal mirror
FLIP_Y = 0x02  # vertical mirror


def flip(a, ftype: int):
    """ccv_flip twin."""
    a, had = to_hwc(a)
    if ftype & FLIP_Y:
        a = jnp.flip(a, axis=ROWS)
    if ftype & FLIP_X:
        a = jnp.flip(a, axis=COLS)
    return from_hwc(a, had)


def blur_taps(sigma: float, as_int: bool):
    """Gaussian taps with ccv's size rule and quantization (ccv_basic.c:418)."""
    fsz = max(1, int(4.0 * sigma + 1.0 - 1e-8)) * 2 + 1
    taps = filters.gaussian_taps(sigma, fsz)
    if as_int:
        taps = np.floor(taps * (256.0 / taps.sum()) + 0.5).astype(np.int64)
    else:
        taps = taps / taps.sum()
    return taps


def blur(a, sigma: float, out_float: bool = False):
    """ccv_blur twin: separable Gaussian, replicate borders.

    8U path: x256 integer taps, >>8 after each of the two passes, clamp at
    the final store — bit-exact vs the reference.
    """
    a, had = to_hwc(a)
    is_int_in = jnp.issubdtype(a.dtype, jnp.integer)
    int_path = is_int_in and not out_float
    taps = blur_taps(sigma, as_int=int_path)
    work = a.astype(jnp.int32 if int_path else jnp.float32)
    shift = 8 if int_path else 0
    out = correlate1d(work, taps, COLS, shift=shift)
    out = correlate1d(out, taps, ROWS, shift=shift)
    if int_path and a.dtype == jnp.uint8:
        out = jnp.clip(out, 0, 255).astype(jnp.uint8)
    elif not int_path:
        out = out.astype(jnp.float32)
    return from_hwc(out, had)


def erode(a, fsz: int = 3):
    """ccv_erode twin: separable running min, replicate borders."""
    a, had = to_hwc(a)
    out = filters.min_filter1d(a, fsz, COLS)
    out = filters.min_filter1d(out, fsz, ROWS)
    return from_hwc(out, had)


def dilate(a, fsz: int = 3):
    """ccv_dilate twin: separable running max, replicate borders."""
    a, had = to_hwc(a)
    out = filters.max_filter1d(a, fsz, COLS)
    out = filters.max_filter1d(out, fsz, ROWS)
    return from_hwc(out, had)
