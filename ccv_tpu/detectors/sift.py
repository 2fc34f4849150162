"""SIFT keypoints + descriptors (reference: lib/ccv_sift.c, VLFeat-derived).

TPU-native redesign:
- Gaussian/DoG/gradient pyramids are stacked XLA ops per octave.
- 3x3x3 extrema detection + iterative quadratic refinement run for *every*
  pixel at once (the 5-step convergence loop is a vectorized fori_loop with
  per-candidate state instead of the reference's per-pixel loop,
  ccv_sift.c:286-316).
- Orientation histograms and 4x4x8 descriptors sample a FIXED grid in the
  rotated, scale-normalized support (the constant sample area cancels under
  L2 normalization / peak ratios), bilinearly interpolating (gx, gy) vector
  planes — scale-proportional like the reference's pixel windows
  (ccv_sift.c:340-470) at ~25x less gather traffic.
- Variable-length keypoint lists cross the host boundary as mask+value
  planes (SURVEY.md hard-parts list).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.ops import basic, resample

SIGMA0 = 1.6
@dataclasses.dataclass
class SiftParams:
    """ccv_sift_default_params twin (ccv_sift.c:36)."""

    noctaves: int = 3
    nlevels: int = 6
    up2x: bool = True
    edge_threshold: float = 10.0
    norm_threshold: float = 0.0
    peak_threshold: float = 0.0


@partial(jax.jit, static_argnames=("nlevels",))
def build_octave(g0, nlevels: int):
    """One octave: returns (gfirst, glast_unblurred, dog(L-1,H,W),
    th(L-3,H,W), md(L-3,H,W)). gfirst = blur(g0, sqrt(s0^2-0.25))."""
    sigmak = 2.0 ** (1.0 / (nlevels - 3))
    dsigma0 = SIGMA0 * sigmak * math.sqrt(1.0 - 1.0 / (sigmak * sigmak))
    g = [None] * (nlevels + 1)
    g[1] = basic.blur(g0.astype(jnp.float32),
                      math.sqrt(SIGMA0 * SIGMA0 - 0.25))
    dogs, ths, mds = [], [], []
    for j in range(1, nlevels):
        sd = dsigma0 * sigmak ** (j - 1)
        g[j + 1] = basic.blur(g[j], sd)
        dogs.append(g[j + 1] - g[j])
        if 1 < j < nlevels - 1:
            th, md = basic.gradient(g[j])
            ths.append(th)
            mds.append(md)
    return g[1], jnp.stack(dogs), jnp.stack(ths), jnp.stack(mds)


def _dense_extrema(dog, peak_threshold: float):
    """26-neighbor extrema of the DoG stack, all levels at once.

    dog: (L1, H, W). Returns a bool mask of shape (L1-2, H, W) for levels
    1..L1-2 (the reference scans the same interior levels,
    ccv_sift.c:271-285). Pure elementwise compares over rolled copies —
    no gathers; the expensive iterative refinement runs later over
    COMPACTED lanes only (round-4 rework: the round-3 form re-ran the
    5-step refine over every pixel of every plane, ~400 full-plane
    gathers per octave for ~10^3 sparse extrema)."""
    L1, H, W = dog.shape
    v = dog[1:-1]
    lt = v <= -peak_threshold
    gt = v >= peak_threshold
    for ds in (-1, 0, 1):
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if ds == 0 and di == 0 and dj == 0:
                    continue
                # roll on H/W wraps, but the border mask excludes those;
                # the level axis is sliced (no wraparound: 1+ds >= 0)
                nb = jnp.roll(dog, (-di, -dj), (1, 2))[1 + ds:L1 - 1 + ds]
                lt = lt & (v < nb)
                gt = gt & (v > nb)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border = (ii >= 1) & (ii < H - 1) & (jj >= 1) & (jj < W - 1)
    return (lt | gt) & border[None]


def _refine_lanes(dog, lvl, ix, iy, alive, peak_threshold: float,
                  edge_threshold: float, nlevels: int):
    """Iterative 3x3x3 quadratic refinement over keypoint LANES.

    dog: (L1, H, W); lvl/ix/iy/alive: (cap,) lane arrays (lvl in
    1..L1-2). Returns (valid, kx, ky, ks) lane arrays. Each refine step
    costs 27 gathers of `cap` elements — vs the dense form's 27
    full-plane gathers per level per step."""
    L1, H, W = dog.shape
    dflat = dog.reshape(-1)

    def n27(yy, xx):
        """gather the 3x3x3 neighborhood at integer (lvl, yy, xx)."""
        cols = []
        for ds in (-1, 0, 1):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    lin = (((lvl + ds) * H + (yy + di).clip(0, H - 1)) * W
                           + (xx + dj).clip(0, W - 1))
                    cols.append(dflat[lin])
        return jnp.stack(cols, -1).reshape(-1, 3, 3, 3)  # (cap, s, dy, dx)

    def solve(N):
            """quadratic fit via the symmetric 3x3 adjugate (Cramer):
            closed-form elementwise VPU math — jnp.linalg.solve lowered
            to a batched-per-pixel LU whose HLO dominated the octave
            program's (remote) compile time. Returns (bx, by, bs, score)."""
            Dxx = N[..., 1, 1, 0] - 2 * N[..., 1, 1, 1] + N[..., 1, 1, 2]
            Dyy = N[..., 1, 0, 1] - 2 * N[..., 1, 1, 1] + N[..., 1, 2, 1]
            Dxy = (N[..., 1, 2, 2] - N[..., 1, 2, 0] - N[..., 1, 0, 2] + N[..., 1, 0, 0]) * 0.25
            score = (Dxx + Dyy) ** 2 / (Dxx * Dyy - Dxy * Dxy)
            Dx = (N[..., 1, 1, 2] - N[..., 1, 1, 0]) * 0.5
            Dy = (N[..., 1, 2, 1] - N[..., 1, 0, 1]) * 0.5
            Ds = (N[..., 2, 1, 1] - N[..., 0, 1, 1]) * 0.5
            Dxs = (N[..., 2, 1, 2] + N[..., 0, 1, 0] - N[..., 2, 1, 0] - N[..., 0, 1, 2]) * 0.25
            Dys = (N[..., 2, 2, 1] + N[..., 0, 0, 1] - N[..., 2, 0, 1] - N[..., 0, 2, 1]) * 0.25
            Dss = N[..., 0, 1, 1] - 2 * N[..., 1, 1, 1] + N[..., 2, 1, 1]
            a00 = Dyy * Dss - Dys * Dys
            a01 = Dys * Dxs - Dxy * Dss
            a02 = Dxy * Dys - Dyy * Dxs
            a11 = Dxx * Dss - Dxs * Dxs
            a12 = Dxy * Dxs - Dxx * Dys
            a22 = Dxx * Dyy - Dxy * Dxy
            det = Dxx * a00 + Dxy * a01 + Dxs * a02
            ok = jnp.abs(det) > 1e-20
            inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            bx = -(a00 * Dx + a01 * Dy + a02 * Ds) * inv
            by = -(a01 * Dx + a11 * Dy + a12 * Ds) * inv
            bs = -(a02 * Dx + a12 * Dy + a22 * Ds) * inv
            return bx, by, bs, score

    def body(k, state):
        ix, iy, alive, kx, ky, ks, score = state
        N = n27(iy, ix)
        bx, by, bs, sc = solve(N)
        nkx = ix + jnp.clip(bx, -1, 1)
        nky = iy + jnp.clip(by, -1, 1)
        nks = lvl + bs
        inb = (nkx >= 1) & (nkx <= W - 2) & (nky >= 1) & (nky <= H - 2)
        nx = (nkx + 0.5).astype(jnp.int32)
        ny = (nky + 0.5).astype(jnp.int32)
        converged = (nx == ix) & (ny == iy)
        kx = jnp.where(alive, nkx, kx)
        ky = jnp.where(alive, nky, ky)
        ks = jnp.where(alive, nks, ks)
        score = jnp.where(alive, sc, score)
        dead = alive & ~inb
        alive = alive & inb & ~converged
        ix = jnp.where(alive, nx, ix)
        iy = jnp.where(alive, ny, iy)
        # permanently kill out-of-bounds candidates by poisoning score
        score = jnp.where(dead, -1.0, score)
        kx = jnp.where(dead, -10.0, kx)
        return ix, iy, alive, kx, ky, ks, score

    cap = ix.shape[0]
    init = (ix, iy, alive, ix.astype(jnp.float32), iy.astype(jnp.float32),
            lvl.astype(jnp.float32), jnp.full((cap,), -1.0))
    ix, iy, _, kx, ky, ks, score = jax.lax.fori_loop(0, 5, body, init)
    final_val = dflat[(lvl * H + iy.clip(0, H - 1)) * W + ix.clip(0, W - 1)]
    et = (edge_threshold + 1.0) ** 2 / edge_threshold
    valid = (alive & (kx > -5)
             & (jnp.abs(final_val) > peak_threshold)
             & (score >= 0) & (score < et)
             & (ks > 0) & (ks < nlevels - 1))
    return valid, kx, ky, ks


ORI_GRID = 16  # sample grid per axis over the +-3 sigma_w orientation disc


def _ori_grid_core(gxy_flat, H, W, kxs, kys, scales, valid, levels):
    """36-bin orientation histograms via a FIXED sample grid in
    scale-normalized coordinates (same rebuild as _desc_grid_core).

    The reference weights every pixel of a 3*sigma_w-radius disc
    (ccv_sift.c:340-366, sigma_w = 1.5 * scale). Sampling the disc on an
    ORI_GRID^2 lattice of [-3, 3]^2 sigma_w units scales every bin by the
    constant sample area — irrelevant to peak selection (ratios and local
    maxima only). Bilinear (gx, gy) interpolation; Gaussian weight
    computed directly (exp(-(u^2+v^2)/2) in normalized units)."""
    G = ORI_GRID
    us = (jnp.arange(G, dtype=jnp.float32) + 0.5) * (6.0 / G) - 3.0
    uu, vv = jnp.meshgrid(us, us, indexing="xy")
    u = uu.reshape(-1)
    v = vv.reshape(-1)
    r2 = u * u + v * v
    w_gauss = jnp.where(r2 <= 9.0 + 1e-3, jnp.exp(-r2 / 2.0), 0.0)  # (P,)

    sw = 1.5 * scales                                 # sigma_w, (N,)
    px = kxs[:, None] + sw[:, None] * u
    py = kys[:, None] + sw[:, None] * v
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = px - x0
    fy = py - y0
    inside = ((px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1))
    base = levels[:, None] * (H * W)

    def corner(yc, xc):
        lin = base + yc.clip(0, H - 1) * W + xc.clip(0, W - 1)
        return gxy_flat[lin]

    g00 = corner(y0, x0)
    g01 = corner(y0, x0 + 1)
    g10 = corner(y0 + 1, x0)
    g11 = corner(y0 + 1, x0 + 1)
    wx = fx[..., None]
    wy = fy[..., None]
    g = ((g00 * (1 - wx) + g01 * wx) * (1 - wy)
         + (g10 * (1 - wx) + g11 * wx) * wy)
    gx, gy = g[..., 0], g[..., 1]
    m = jnp.sqrt(gx * gx + gy * gy)
    theta = jnp.arctan2(gy, gx)                      # radians, [-pi, pi]
    mw = (jnp.where(inside, m, 0.0) * w_gauss[None, :]
          * valid[:, None])                           # (N, P)
    # tent into 36 bins: fbin matches the reference's degrees*0.1 - 0.5
    deg = jnp.mod(theta * (180.0 / math.pi), 360.0)
    fbin = deg * 0.1 - 0.5
    d = jnp.abs(fbin[..., None] - jnp.arange(36.0))
    tri = jnp.maximum(0.0, 1.0 - jnp.minimum(d, 36.0 - d))   # (N, P, 36)
    bins = jnp.einsum("np,npb->nb", mw, tri,
                      preferred_element_type=jnp.float32)
    for _ in range(6):
        bins = (jnp.roll(bins, 1, 1) + bins + jnp.roll(bins, -1, 1)) / 3.0
    return bins


DESC_GRID = 16  # sample grid per axis over the 4x4-bin descriptor support


def _desc_grid_core(gxy_flat, H, W, kxs, kys, scales, levels, angles, valid):
    """4x4x8 SIFT descriptors via a FIXED sample grid in the rotated,
    scale-normalized descriptor frame (the round-3 rebuild of the fixed
    113x113 pixel gather, which cost ~25k gathered elements per keypoint
    regardless of scale).

    The reference integrates tent-weighted gradients over every pixel of
    a scale-proportional window (ccv_sift.c:391-470). Point-sampling that
    integral on a DESC_GRID^2 lattice of the normalized support
    [-2.5, 2.5]^2 computes the same quantity up to the constant sample
    area (5*SBP/G)^2 — which cancels exactly under the final L2
    normalization. Gradients are bilinearly interpolated from (gx, gy)
    vector planes (interpolating angle planes would break at the 0/360
    wrap). Cost per keypoint: 4 bilinear-corner gathers of G^2 x 2
    elements (~2k) — ~25x less traffic than the pixel-window form, and
    the Gaussian weight is computed directly on the VPU (no LUT gather).
    """
    G = DESC_GRID
    P = G * G
    step = 5.0 / G
    us = (jnp.arange(G, dtype=jnp.float32) + 0.5) * step - 2.5
    uu, vv = jnp.meshgrid(us, us, indexing="xy")
    u = uu.reshape(-1)   # (P,) normalized x
    v = vv.reshape(-1)   # (P,) normalized y
    w_gauss = jnp.exp(-(u * u + v * v) / 8.0)  # sigma = 2 bins
    centers = jnp.array([-1.5, -0.5, 0.5, 1.5], jnp.float32)
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - centers))  # (P, 4)
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(v[:, None] - centers))  # (P, 4)
    AT = ((w_gauss[:, None] * ty)[:, :, None] * tx[:, None, :]).reshape(P, 16)

    SBP = 3.0 * scales  # (N,)
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    # sample positions: k + SBP * R(angle)^-1 @ (u, v)
    px = kxs[:, None] + SBP[:, None] * (ca[:, None] * u - sa[:, None] * v)
    py = kys[:, None] + SBP[:, None] * (sa[:, None] * u + ca[:, None] * v)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = px - x0
    fy = py - y0
    inside = ((px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1))
    base = levels[:, None] * (H * W)

    def corner(yc, xc):
        lin = base + yc.clip(0, H - 1) * W + xc.clip(0, W - 1)
        return gxy_flat[lin]  # (N, P, 2)

    g00 = corner(y0, x0)
    g01 = corner(y0, x0 + 1)
    g10 = corner(y0 + 1, x0)
    g11 = corner(y0 + 1, x0 + 1)
    wx = fx[..., None]
    wy = fy[..., None]
    g = ((g00 * (1 - wx) + g01 * wx) * (1 - wy)
         + (g10 * (1 - wx) + g11 * wx) * wy)      # (N, P, 2)
    gx, gy = g[..., 0], g[..., 1]
    m = jnp.sqrt(gx * gx + gy * gy)
    theta = jnp.arctan2(gy, gx)                    # radians
    m = jnp.where(inside, m, 0.0) * valid[:, None]
    nt = 8.0 * jnp.mod(theta - angles[:, None], 2.0 * math.pi) / (2.0 * math.pi)
    dtt = jnp.abs(nt[..., None] - jnp.arange(8.0))
    B = jnp.maximum(0.0, 1.0 - jnp.minimum(dtt, 8.0 - dtt))   # (N, P, 8)
    desc = jnp.einsum("pi,npj->nij", AT, B * m[..., None],
                      preferred_element_type=jnp.float32).reshape(-1, 128)
    norm = jnp.sqrt(jnp.sum(desc * desc, axis=1, keepdims=True))
    desc = desc / jnp.maximum(norm, 1e-12)
    desc = jnp.minimum(desc, 0.2)
    norm2 = jnp.sqrt(jnp.sum(desc * desc, axis=1, keepdims=True))
    return desc / jnp.maximum(norm2, 1e-12)


def _build_pyramids(g0, nlevels: int, up2x_octave: bool):
    """Gaussian chain -> (dog, th, md) stacks for one octave
    (ccv_sift.c:233-270; the -1 octave starts at sigma sqrt(2))."""
    sigmak = 2.0 ** (1.0 / (nlevels - 3))
    dsigma0 = SIGMA0 * sigmak * math.sqrt(1.0 - 1.0 / (sigmak * sigmak))
    if up2x_octave:
        g = basic.blur(g0.astype(jnp.float32),
                       math.sqrt(SIGMA0 * SIGMA0 - 2.0))
    else:
        g = basic.blur(g0.astype(jnp.float32),
                       math.sqrt(SIGMA0 * SIGMA0 - 0.25))
    dogs, ths, mds = [], [], []
    for j in range(1, nlevels):
        gn = basic.blur(g, dsigma0 * sigmak ** (j - 1))
        dogs.append(gn - g)
        if 1 < j < nlevels - 1:
            t_, m_ = basic.gradient(g)
            ths.append(t_)
            mds.append(m_)
        g = gn
    return jnp.stack(dogs), jnp.stack(ths), jnp.stack(mds)


def _compact_mask(flat, cap: int, block: int = 256):
    """Indices of the first `cap` set bits of `flat`, in scan order.

    Two-level compaction: jnp.nonzero's cumsum+scatter over the full
    plane cost ~17 ms per big octave on the v5e; reducing to nonempty
    `block`-sized blocks first (a nonempty block holds >=1 set bit, so
    count <= cap implies <= cap nonempty blocks — taking `cap` blocks is
    lossless whenever the caller's overflow re-run wouldn't fire anyway)
    makes the scatter domain cap*block instead of H*W*L. Measured ~1 ms
    at the scene -1-octave size. Returns (idx, count)."""
    n = flat.shape[0]
    pad = (-n) % block
    mp = jnp.pad(flat, (0, pad))
    nb = mp.shape[0] // block
    mb = mp.reshape(nb, block)
    blk_any = mb.any(1)
    nblk = blk_any.sum(dtype=jnp.int32)
    (bidx,) = jnp.nonzero(blk_any, size=cap, fill_value=nb - 1)
    # fill blocks repeat block nb-1: mask everything past the true count
    sub = mb[bidx].reshape(-1) & jnp.repeat(jnp.arange(cap) < nblk, block)
    (sidx,) = jnp.nonzero(sub, size=cap, fill_value=0)
    idx = bidx[sidx // block] * block + sidx % block
    return idx, flat.sum(dtype=jnp.int32)


def _octave_body(g0, peak_threshold: float, edge_threshold: float,
                 nlevels: int, cap: int, cap_e: int, want_desc: bool,
                 up2x_octave: bool):
    """The WHOLE per-octave pipeline as one traced block: pyramid ->
    extrema -> compact to `cap` keypoint lanes -> refine the lanes ->
    orientation histograms -> peak selection -> compact to `cap_e`
    (keypoint, angle) entries -> descriptors.

    Caller composes several of these into ONE device program
    (_sift_program): the tunneled link costs ~29 ms per program
    execution, so 8 separate octave programs paid ~230 ms of pure
    round-trip before any compute. The true counts ride back with the
    results, and the host re-runs an octave at bigger caps on overflow
    (the SWT lane-rebucketing pattern)."""
    sigmak = 2.0 ** (1.0 / (nlevels - 3))
    dog, th, md = _build_pyramids(g0, nlevels, up2x_octave)
    L, H, W = dog.shape

    # dense extrema (elementwise) -> compact to `cap` lanes -> refine the
    # LANES only (the 5-step quadratic fit gathers 27 x cap elements per
    # step instead of 27 full planes per level per step)
    ext = _dense_extrema(dog, peak_threshold)
    flat = ext.reshape(-1)
    idx, count = _compact_mask(flat, cap)
    lane = jnp.arange(cap) < count
    lvl = jnp.where(lane, (idx // (H * W)).astype(jnp.int32) + 1, 1)
    rem = (idx % (H * W)).astype(jnp.int32)
    iy0 = jnp.where(lane, rem // W, 1)
    ix0 = jnp.where(lane, rem % W, 1)
    valid, kxs, kys, kss = _refine_lanes(dog, lvl, ix0, iy0, lane,
                                         peak_threshold, edge_threshold,
                                         nlevels)
    kxs = jnp.where(valid, kxs, 0.0)
    kys = jnp.where(valid, kys, 0.0)
    kss = jnp.where(valid, kss, 1.0)
    levels = jnp.where(valid, lvl, 1)
    sigma = SIGMA0 * sigmak * jnp.power(2.0, kss / (nlevels - 3))
    vmask = valid.astype(jnp.float32)
    lane = valid  # downstream peak selection keys off surviving lanes

    # (gx, gy) vector planes for interpolated grid sampling (th is in
    # degrees from basic.gradient); shared by orientation + descriptors
    rad = th * (math.pi / 180.0)
    gxy_flat = jnp.stack([md * jnp.cos(rad), md * jnp.sin(rad)],
                         axis=-1).reshape(-1, 2)
    bins = _ori_grid_core(gxy_flat, H, W, kxs, kys, sigma, vmask,
                          levels - 1)

    # orientation peaks, fully on device (ccv_sift.c:370-385): argmax
    # always qualifies; other strict local maxima above 0.8*max also do
    bp = jnp.roll(bins, -1, 1)
    bm = jnp.roll(bins, 1, 1)
    mx = bins.max(1)
    peak = (bins > 0.8 * mx[:, None]) & (bins > bp) & (bins > bm)
    maxhot = jax.nn.one_hot(jnp.argmax(bins, 1), 36, dtype=bool)
    peak = (peak | maxhot) & lane[:, None]
    den = bp + bm - 2.0 * bins
    di = jnp.where(den != 0, -0.5 * (bp - bm) / den, 0.0)
    ang = (2.0 * math.pi / 36.0) * (jnp.arange(36.0)[None, :] + di + 0.5)

    ecount = peak.sum(dtype=jnp.int32)
    (eidx,) = jnp.nonzero(peak.reshape(-1), size=cap_e, fill_value=0)
    elane = jnp.arange(cap_e) < ecount
    ekp = (eidx // 36).astype(jnp.int32)
    eang = jnp.where(elane, ang.reshape(-1)[eidx], 0.0)
    ekx = kxs[ekp]
    eky = kys[ekp]
    esig = jnp.where(elane, sigma[ekp], 1.0)
    elvl = levels[ekp]
    out = dict(count=count, ecount=ecount, ekp=ekp, ekx=ekx, eky=eky,
               esig=esig, elvl=elvl, eang=eang)
    if want_desc:
        out["desc"] = _desc_grid_core(gxy_flat, H, W,
                                      ekx, eky, esig, elvl - 1, eang,
                                      elane.astype(jnp.float32))
    return out


_octave_program = partial(jax.jit, static_argnames=(
    "nlevels", "cap", "cap_e", "want_desc", "up2x_octave"))(_octave_body)


@partial(jax.jit, static_argnames=("nlevels", "spec", "want_desc"))
def _sift_program(imgs, peak_threshold: float, edge_threshold: float,
                  nlevels: int, spec, want_desc: bool):
    """EVERY octave of EVERY image as one device program, one sync.

    imgs: tuple of (H, W) float planes; spec: per-image tuple of
    (oct_i, cap, cap_e) — oct_i == -1 is the 2x-upsampled octave, i >= 0
    reads the i-fold sample_down chain (ccv_sift.c:233). The tunneled
    device link costs ~29 ms per program execution and does not overlap
    queued executions, so fusing the bench pair's 8 octave programs into
    one brings the pair from ~620 ms to ~sync + sum-of-compute."""
    outs = []
    for img, ispec in zip(imgs, spec):
        chain = [img]
        for oct_i, cap, cap_e in ispec:
            if oct_i >= 0:
                while len(chain) <= oct_i:
                    chain.append(resample.sample_down(chain[-1]))
            g0 = resample.sample_up(img) if oct_i == -1 else chain[oct_i]
            outs.append(_octave_body(g0, peak_threshold, edge_threshold,
                                     nlevels, cap, cap_e, want_desc,
                                     oct_i == -1))
    return tuple(outs)


def _bucket(n: int) -> int:
    """Round a keypoint count up to a power of two (min 32) so repeated
    calls hit the jit compile cache (the SWT _BUCKETS pattern)."""
    b = 32
    while b < n:
        b *= 2
    return b


_CAP_HINT: dict = {}   # (H, W, octave) -> (count, entry count) high-water


def _octave_caps(H: int, W: int, oct_i: int):
    """Static (cap, cap_e) for an octave: shape-derived guess, grown by
    the per-shape high-water hint. Caps only ever GROW — shrinking to a
    measured count forced a second full compile of the fused program on
    every fresh process (the round-3 '5.2 s steady state' was really a
    hint-shrink recompile)."""
    oh = H << 1 if oct_i == -1 else H >> max(oct_i, 0)
    ow = W << 1 if oct_i == -1 else W >> max(oct_i, 0)
    # extrema density rises as octaves shrink (scene oct2 hits 0.6% of
    # pixels); the 128 floor keeps small octaves from overflowing their
    # //256 guess, which would cost a one-off recompile
    guess = max(_bucket((oh * ow) // 256), 128)
    hint = _CAP_HINT.get((oh, ow, oct_i))
    if hint is None:
        return guess, guess
    return (max(guess, _bucket(hint[0])),
            max(guess, _bucket(max(hint[1], 32))))


def sift_many(imgs, params: Optional[SiftParams] = None,
              want_desc: bool = True):
    """SIFT over a LIST of images as ONE device program + ONE sync.

    bin/siftmatch runs object + scene: both images' full octave
    pyramids compile into a single program (_sift_program), so the pair
    costs one ~29 ms tunnel round-trip plus pure compute. Returns
    [(keypoints, descriptors), ...]."""
    from ccv_tpu.core.dense_matrix import as_array

    params = params or SiftParams()
    nlevels = params.nlevels

    planes, spec, meta = [], [], []
    for img_i, a in enumerate(imgs):
        img = as_array(a)
        if img.ndim == 3:
            img = img[..., 0]
        # keep the ORIGINAL dtype: sample_down/up use exact integer
        # arithmetic for int inputs (truncating /256), matching the
        # reference's u8 octave chain; _build_pyramids casts to f32
        planes.append(jnp.asarray(img))
        H, W = int(img.shape[0]), int(img.shape[1])
        octs = ([-1] if params.up2x else []) + list(range(params.noctaves))
        ispec = []
        for oct_i in octs:
            cap, cap_e = _octave_caps(H, W, oct_i)
            ispec.append((oct_i, cap, cap_e))
            meta.append((img_i, oct_i, H, W, cap, cap_e))
        spec.append(tuple(ispec))

    results = jax.device_get(_sift_program(
        tuple(planes), params.peak_threshold, params.edge_threshold,
        nlevels, tuple(spec), want_desc))

    out = [([], []) for _ in imgs]
    for (img_i, oct_i, H, W, cap, cap_e), r in zip(meta, results):
        n, ne = int(r["count"]), int(r["ecount"])
        oh = H << 1 if oct_i == -1 else H >> max(oct_i, 0)
        ow = W << 1 if oct_i == -1 else W >> max(oct_i, 0)
        hkey = (oh, ow, oct_i)
        prev = _CAP_HINT.get(hkey, (0, 0))
        _CAP_HINT[hkey] = (max(prev[0], n), max(prev[1], ne))
        # overflowed caps drop keypoints: re-run this octave bigger (the
        # entry count can only be trusted once the keypoint cap holds).
        # Rare by construction (caps over-provision ~2x), so the one-off
        # octave recompile is acceptable.
        tries = 0
        while (n > cap or ne > cap_e) and tries < 4:
            cap = _bucket(n)
            cap_e = _bucket(max(ne, 32))
            g0 = planes[img_i]
            for _ in range(max(oct_i, 0)):
                g0 = resample.sample_down(g0)
            if oct_i == -1:
                g0 = resample.sample_up(planes[img_i])
            r = jax.device_get(_octave_program(
                g0, params.peak_threshold, params.edge_threshold,
                nlevels, cap, cap_e, want_desc, oct_i == -1))
            n, ne = int(r["count"]), int(r["ecount"])
            prev = _CAP_HINT.get(hkey, (0, 0))
            _CAP_HINT[hkey] = (max(prev[0], n), max(prev[1], ne))
            tries += 1
        if ne == 0:
            continue
        s = 2.0 ** oct_i
        ekx, eky = r["ekx"], r["eky"]
        esig, elvl, eang = r["esig"], r["elvl"], r["eang"]
        keypoints, desc_rows = out[img_i]
        for i in range(ne):
            keypoints.append(dict(
                x=float(ekx[i] * s), y=float(eky[i] * s), octave=oct_i,
                level=int(elvl[i]), scale=float(esig[i]),
                angle=float(eang[i])))
        if want_desc:
            desc_rows.append(r["desc"][:ne])

    final = []
    for keypoints, desc_rows in out:
        desc = (np.concatenate(desc_rows, 0).astype(np.float32)
                if desc_rows else None)
        final.append((keypoints, desc))
    return final


def sift(a, params: Optional[SiftParams] = None, want_desc: bool = True):
    """ccv_sift twin (ccv_sift.c:172): returns (keypoints, descriptors).

    keypoints: list of dicts {x, y, octave, level, scale, angle} in input
    coordinates; descriptors: (N, 128) float32 numpy or None.

    Every octave runs as ONE fused device program (_octave_program); all
    octaves dispatch before a single batched device_get — in steady state
    one transfer and zero mid-pipeline syncs per image.
    """
    return sift_many([a], params, want_desc)[0]


def _match_core(D1, v1, D2, v2, ratio: float):
    """Ratio-test NN matching over PADDED descriptor rows on device.

    D1 (N1, 128) against D2 (N2, 128) with validity masks; invalid
    columns are excluded via +inf distance, invalid rows report ok =
    False. One MXU matmul + top-2."""
    dots = jnp.dot(D1, D2.T, preferred_element_type=jnp.float32)
    n1 = jnp.sum(D1 * D1, axis=1, keepdims=True)
    n2 = jnp.sum(D2 * D2, axis=1)
    dist = n1 + n2[None, :] - 2.0 * dots
    dist = jnp.where(v2[None, :], dist, jnp.inf)
    neg, idx = jax.lax.top_k(-dist, 2)
    best, second = -neg[:, 0], -neg[:, 1]
    ok = v1 & (best < ratio * second)
    return idx[:, 0], ok


@partial(jax.jit, static_argnames=("nlevels", "spec", "ratio"))
def _pair_match_program(imgs, peak_threshold: float, edge_threshold: float,
                        nlevels: int, spec, ratio: float):
    """bin/siftmatch as ONE device program: both pyramids, keypoints,
    descriptors AND ratio-test matching — descriptors never leave the
    device (the padded (sum cap_e, 128) f32 rows cost ~100 ms over the
    tunneled link; the match result is a few KB)."""
    outs = list(_sift_program(imgs, peak_threshold, edge_threshold,
                              nlevels, spec, True))
    rows, vals = [], []
    k = 0
    for ispec in spec:
        D = jnp.concatenate([outs[k + j]["desc"]
                             for j in range(len(ispec))], 0)
        v = jnp.concatenate(
            [jnp.arange(ispec[j][2]) < outs[k + j]["ecount"]
             for j in range(len(ispec))], 0)
        rows.append(D)
        vals.append(v)
        k += len(ispec)
    midx, mok = _match_core(rows[0], vals[0], rows[1], vals[1], ratio)
    slim = [{key: val for key, val in o.items() if key != "desc"}
            for o in outs]
    return tuple(slim), midx, mok


def match_pair(a, b, params: Optional[SiftParams] = None,
               ratio: float = 0.36):
    """bin/siftmatch.c twin: SIFT both images and match, one round-trip.

    Returns (kps1, kps2, pairs) where pairs is a list of (i1, i2)
    keypoint-list indices passing the squared-distance ratio test."""
    from ccv_tpu.core.dense_matrix import as_array

    params = params or SiftParams()
    planes, spec = [], []
    for a_ in (a, b):
        img = as_array(a_)
        if img.ndim == 3:
            img = img[..., 0]
        planes.append(jnp.asarray(img))
        H, W = int(img.shape[0]), int(img.shape[1])
        octs = ([-1] if params.up2x else []) + list(range(params.noctaves))
        spec.append(tuple((oct_i,) + _octave_caps(H, W, oct_i)
                          for oct_i in octs))

    outs, midx, mok = jax.device_get(_pair_match_program(
        tuple(planes), params.peak_threshold, params.edge_threshold,
        params.nlevels, tuple(spec), ratio))

    kps = [[], []]
    # padded row -> keypoint-list index, per image
    rowmap = [{}, {}]
    k = 0
    row_base = [0, 0]
    for img_i, ispec in enumerate(spec):
        for j, (oct_i, cap, cap_e) in enumerate(ispec):
            r = outs[k + j]
            ne = min(int(r["ecount"]), cap_e)
            s = 2.0 ** oct_i
            for i in range(ne):
                rowmap[img_i][row_base[img_i] + i] = len(kps[img_i])
                kps[img_i].append(dict(
                    x=float(r["ekx"][i] * s), y=float(r["eky"][i] * s),
                    octave=oct_i, level=int(r["elvl"][i]),
                    scale=float(r["esig"][i]), angle=float(r["eang"][i])))
            row_base[img_i] += cap_e
        k += len(ispec)

    pairs = []
    for r1, (r2, ok) in enumerate(zip(midx, mok)):
        if ok and r1 in rowmap[0] and int(r2) in rowmap[1]:
            pairs.append((rowmap[0][r1], rowmap[1][int(r2)]))
    return kps[0], kps[1], pairs


def match(desc1: np.ndarray, desc2: np.ndarray, ratio: float = 0.36):
    """bin/siftmatch twin: nearest-neighbor matching with the reference's
    squared-distance ratio test (bin/siftmatch.c uses threshold 0.36 on
    dist1/dist2). Distances computed as one MXU matmul."""
    d1 = jnp.asarray(desc1)
    d2 = jnp.asarray(desc2)
    dots = d1 @ d2.T
    n1 = jnp.sum(d1 * d1, axis=1, keepdims=True)
    n2 = jnp.sum(d2 * d2, axis=1)
    dist = n1 + n2 - 2 * dots
    order = jnp.argsort(dist, axis=1)
    best = jnp.take_along_axis(dist, order[:, :1], axis=1)[:, 0]
    second = jnp.take_along_axis(dist, order[:, 1:2], axis=1)[:, 0]
    ok = best < ratio * second
    return np.asarray(order[:, 0]), np.asarray(ok)
