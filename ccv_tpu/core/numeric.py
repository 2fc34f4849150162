"""Numerical methods (reference: lib/ccv_numeric.c).

- filter: frequency-domain convolution (ccv_filter, ccv_numeric.c; KissFFT
  there, jnp.fft here — XLA lowers FFTs natively).
- distance_transform: Felzenszwalb-Huttenlocher generalized squared
  distance transform, expressed as two 1-D lower-envelope passes.
- kmeans1d: optimal 1-D k-means via the monotone divide-and-conquer DP
  (the reference uses SMAWK; both give the optimal clustering).
- minimize: Polak-Ribiere conjugate gradient with the reference's
  line-search constants (ccv_minimize, a minimize.m descendant).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# frequency-domain convolution
# ---------------------------------------------------------------------------

def filter(a, b, mode: str = "same"):
    """ccv_filter twin: 2-D convolution of image `a` with kernel `b` via FFT.

    The reference zero-pads to FFT-friendly sizes and multiplies spectra;
    output matches 'same' convolution with the kernel centered.
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    H, W = a.shape[-2], a.shape[-1]
    kh, kw = b.shape[-2], b.shape[-1]
    fh, fw = H + kh - 1, W + kw - 1
    fa = jnp.fft.rfft2(a, (fh, fw))
    fb = jnp.fft.rfft2(b, (fh, fw))
    full = jnp.fft.irfft2(fa * fb, (fh, fw))
    y0, x0 = kh // 2, kw // 2
    return full[..., y0:y0 + H, x0:x0 + W]


# ---------------------------------------------------------------------------
# generalized distance transform (Felzenszwalb & Huttenlocher)
# ---------------------------------------------------------------------------

def _dt1d(f, mult: float, shift: float):
    """min_q f[q] + mult*(p-q)^2 + shift*(p-q) along the last axis.

    Batched brute-force min over the axis — O(n^2) but fully vectorized;
    for detector-sized rows XLA turns it into one big VPU reduction (the
    reference's O(n) envelope scan is serial and unvectorizable).
    """
    n = f.shape[-1]
    p = jnp.arange(n, dtype=jnp.float32)
    d = p[:, None] - p[None, :]  # (p, q)
    cost = f[..., None, :] + mult * d * d + shift * d
    idx = jnp.argmin(cost, axis=-1)
    val = jnp.min(cost, axis=-1)
    return val, idx


def distance_transform(a, dx: float = 0.0, dy: float = 0.0,
                       dxx: float = 1.0, dyy: float = 1.0):
    """ccv_distance_transform twin: rows then columns; returns
    (values, x_offsets, y_offsets)."""
    a = jnp.asarray(a, jnp.float32)
    rowv, rowi = _dt1d(a, dxx, dx)
    colv, coli = _dt1d(jnp.swapaxes(rowv, -1, -2), dyy, dy)
    out = jnp.swapaxes(colv, -1, -2)
    ybest = jnp.swapaxes(coli, -1, -2)
    xbest = jnp.take_along_axis(rowi, ybest, axis=-2) if rowi.ndim > 1 else rowi
    return out, xbest, ybest


# ---------------------------------------------------------------------------
# optimal 1-D k-means (host / numpy)
# ---------------------------------------------------------------------------

def kmeans1d(values: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """ccv_kmeans1d twin: optimal clustering of sorted 1-D data.

    Returns (clusters[n] int32, centroids[k] float64). Divide-and-conquer
    over the totally-monotone argmin matrix — same optimum as the
    reference's SMAWK.
    """
    v = np.asarray(values, np.float64).reshape(-1)
    n = v.size
    order = np.argsort(v, kind="stable")
    s = v[order]
    cs = np.concatenate([[0.0], np.cumsum(s)])
    cs2 = np.concatenate([[0.0], np.cumsum(s * s)])

    def cost(j, i):  # cluster [j..i] inclusive
        if j > i:
            return 0.0
        mu = (cs[i + 1] - cs[j]) / (i - j + 1)
        return cs2[i + 1] - cs2[j] - (i - j + 1) * mu * mu

    D_prev = np.array([cost(0, i) for i in range(n)])
    T = np.zeros((k, n), np.int32)

    for k_ in range(1, k):
        D_next = np.empty(n)
        Tk = T[k_]

        def solve(ilo, ihi, jlo, jhi):
            if ilo > ihi:
                return
            mid = (ilo + ihi) // 2
            best, bestj = np.inf, jlo
            for j in range(jlo, min(jhi, mid) + 1):
                c = (D_prev[j - 1] if j > 0 else 0.0) + cost(j, mid)
                if c < best:
                    best, bestj = c, j
            D_next[mid] = best
            Tk[mid] = bestj
            solve(ilo, mid - 1, jlo, bestj)
            solve(mid + 1, ihi, bestj, jhi)

        import sys
        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 2 * n + 100))
        solve(0, n - 1, 0, n - 1)
        sys.setrecursionlimit(old)
        D_prev = D_next

    # backtrack
    clusters_sorted = np.zeros(n, np.int32)
    centroids = np.zeros(k)
    t = n
    for k_ in range(k - 1, -1, -1):
        t_new = T[k_, t - 1] if k_ > 0 else 0
        seg = s[t_new:t]
        clusters_sorted[t_new:t] = k_
        centroids[k_] = seg.mean() if seg.size else 0.0
        t = t_new
        if t == 0:
            break
    clusters = np.zeros(n, np.int32)
    clusters[order] = clusters_sorted
    return clusters, centroids


# ---------------------------------------------------------------------------
# conjugate-gradient minimize
# ---------------------------------------------------------------------------

def minimize(fn: Callable, x0, max_iter: int = 100, red: float = 1.0):
    """ccv_minimize twin: Polak-Ribiere CG with slope-ratio line search.

    fn(x) -> (value, gradient). Uses jax arrays; runs on host control flow
    (the reference is a direct minimize.m port; optimization loops are not
    perf-critical here).
    """
    INT = 0.1
    EXT = 3.0
    MAX = 20
    RATIO = 10.0
    SIG = 0.1
    RHO = SIG / 2
    x = jnp.asarray(x0, jnp.float32)
    f0, df0 = fn(x)
    s = -df0
    d0 = -jnp.vdot(s, s)
    x3 = red / (1.0 - d0)
    i = 0
    ls_failed = False
    while i < max_iter:
        i += 1
        X0, F0, dF0 = x, f0, df0
        M = MAX
        x2, f2, d2, f3, df3 = 0.0, f0, d0, f0, df0
        success = False
        while True:
            while not success and M > 0:
                M -= 1
                f3, df3 = fn(x + x3 * s)
                if bool(jnp.isnan(f3)) or bool(jnp.isinf(f3)) or bool(
                        jnp.any(jnp.isnan(df3) | jnp.isinf(df3))):
                    x3 = (x2 + x3) / 2
                else:
                    success = True
            if float(f3) < float(F0):
                X0, F0, dF0 = x + x3 * s, f3, df3
            d3 = jnp.vdot(df3, s)
            if float(d3) > SIG * float(d0) or float(f3) > float(f0) + x3 * RHO * float(d0) or M == 0:
                break
            x1, f1, d1 = x2, f2, d2
            x2, f2, d2 = x3, f3, d3
            A = 6 * (f1 - f2) + 3 * (d2 + d1) * (x2 - x1)
            B = 3 * (f2 - f1) - (2 * d1 + d2) * (x2 - x1)
            denom = B + jnp.sqrt(jnp.maximum(B * B - A * d1 * (x2 - x1), 0))
            x3 = x1 - d1 * (x2 - x1) ** 2 / jnp.where(denom == 0, 1e-20, denom)
            if bool(jnp.isnan(x3)) or bool(jnp.isinf(x3)) or float(x3) < 0:
                x3 = x2 * EXT
            elif float(x3) > x2 * EXT:
                x3 = x2 * EXT
            elif float(x3) < x2 + INT * (x2 - x1):
                x3 = x2 + INT * (x2 - x1)
            x3 = float(x3)
        # done line search
        if float(jnp.abs(d3)) < -SIG * float(d0) and float(f3) < float(f0) + x3 * RHO * float(d0):
            x = x + x3 * s
            f0 = f3
            # Polak-Ribiere update
            s = (jnp.vdot(df3, df3) - jnp.vdot(df0, df3)) / jnp.vdot(df0, df0) * s - df3
            df0 = df3
            d3 = d0
            d0 = jnp.vdot(df0, s)
            if float(d0) > 0:
                s = -df0
                d0 = -jnp.vdot(s, s)
            x3 = x3 * min(RATIO, float(d3 / (float(d0) - 1e-37)))
            ls_failed = False
        else:
            x, f0, df0 = X0, F0, dF0
            if ls_failed:
                break
            s = -df0
            d0 = -jnp.vdot(s, s)
            x3 = 1.0 / (1.0 - float(d0))
            ls_failed = True
    return x, f0


# ---------------------------------------------------------------------------
# linear algebra (ccv.h:1098-1100)
# ---------------------------------------------------------------------------

def invert(a):
    """ccv_invert twin: matrix inverse (the reference computes the
    Moore-Penrose pseudo-inverse via its own QR; jnp.linalg handles both
    square and rectangular through pinv)."""
    a = jnp.asarray(a, jnp.float32)
    if a.shape[-1] == a.shape[-2]:
        return jnp.linalg.inv(a)
    return jnp.linalg.pinv(a)


def solve(a, b):
    """ccv_solve twin: least-squares solve of a x = b."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.linalg.lstsq(a, b)[0]


def eigen(a):
    """ccv_eigen twin (real symmetric input): returns (vectors, lambdas)
    with eigenvectors as ROWS like the reference (Jacobi sweep output),
    sorted by descending eigenvalue."""
    a = jnp.asarray(a, jnp.float32)
    lam, vec = jnp.linalg.eigh(a)          # ascending
    order = jnp.argsort(-lam)
    return vec[:, order].T, lam[order]
