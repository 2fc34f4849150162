"""SWT text detector (reference: lib/ccv_swt.c).

TPU-native redesign of the per-pixel Bresenham ray casting (_ccv_swt,
ccv_swt.c:41-230). Edge pixels are compacted into ray lanes whose count
is bucketed to the measured edge density (static shapes, one compile per
bucket). The reference's err-update recurrence reduces to a closed form
(major axis advances every step, minor follows a ceil staircase —
verified exhaustively), so every ray position is pure arithmetic: no
serial march at all. Hit testing is one gather into a cross-dilated edge
map (the 5-point probe of ccv_swt.c:71-74); stroke painting and the
median rewrite pass scatter only the ~(edges x stroke width) live path
cells, addressed through per-ray contiguous slot ranges recovered by a
stamp + cummax (no dense-mask nonzero). The six ray families
(2 polarities x {direct, +-rotated}, ccv_swt.c:86) run batched on one
axis in a single program. The median is a rank-select by binary search
over the value range (10 masked count-reductions — far cheaper than an
XLA sort). Overlap resolution is max-width-wins (the reference processes
strokes in ascending width order sequentially — equivalent except for
rare read-after-write chains; fidelity is gated at detection level).

On accelerators the letter stage runs ON DEVICE (`_letters_device`):
stroke pixels compact into lanes, connected components run as min-label
propagation + pointer jumping over a precomputed 8-neighbor lane table,
per-component statistics are row scatter-adds keyed by label, the scalar
letter filters and a histogram rank-select for the thickness median run
per component row, and the occlusion pre-count is a direct
pixel-in-kept-bbox test — so only ~26 KB of letter rows cross the device
link instead of the (3, H, W) planes. Textline pairing / word breakdown
stay small-n host math (numpy), mirroring _ccv_swt_connected_letters /
_merge_textline / _break_words (ccv_swt.c:305/:499/:557). The host
letter path (`_cc_host` native C++ union-find + vectorized numpy stats)
remains the CPU-backend route and the table-overflow fallback.
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.detectors.common import Comp, group
from ccv_tpu.ops import basic, classic, resample


@dataclasses.dataclass
class SwtParams:
    """ccv_swt_default_params twin (ccv_swt.c:4)."""

    interval: int = 1
    same_word_thresh: Tuple[float, float] = (0.1, 0.8)
    min_neighbors: int = 1
    scale_invariant: bool = False
    size: int = 3
    low_thresh: int = 124
    high_thresh: int = 204
    max_height: int = 300
    min_height: int = 8
    min_area: int = 38
    letter_occlude_thresh: int = 3
    aspect_ratio: float = 8.0
    std_ratio: float = 0.83
    thickness_ratio: float = 1.5
    height_ratio: float = 1.7
    intensity_thresh: int = 31
    distance_ratio: float = 2.9
    intersect_ratio: float = 1.3
    letter_thresh: int = 3
    elongate_ratio: float = 1.9
    breakdown: bool = True
    breakdown_ratio: float = 1.0


MAX_RAY = 70
# 5-neighborhood search (cross) and 3x3 gradient check (ccv_swt.c:71-74)
_DX5 = np.array([-1, 0, 1, 0, 0], np.int32)
_DY5 = np.array([0, 0, 0, -1, 1], np.int32)
_DX9 = np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], np.int32)
_DY9 = np.array([0, 0, 0, -1, -1, -1, 1, 1, 1], np.int32)


def _ray_lanes(hw: int) -> int:
    """Static ray-lane cap from the image size.

    Canny + close_outline edge density stays well under 1/6 on natural
    images (street.png measures 9.6%); edges beyond the cap (pathological
    inputs) are dropped with a degraded (still valid) stroke map.
    """
    return min(hw, -(-hw // 6 // 4096) * 4096) or 4096


_BUCKETS = (2048, 3072, 4096, 6144, 8192, 12288, 16384, 24576, 32768,
            49152, 65536, 98304, 131072, 196608, 262144)
_T_BUCKETS = (16, 32, MAX_RAY)


def _bucket_for(count: int, hw: int) -> int:
    """Smallest lane bucket >= the measured edge count (capped).

    Bucketing keeps shapes static (one compile per bucket) while sizing
    the gather/scatter work to the actual edge density instead of the
    worst case — the ray program is gather-bound, so every wasted lane is
    ~8 ns x T x 6 families of wasted probes.
    """
    cap = _ray_lanes(hw)
    for b in _BUCKETS:
        if b >= min(count, cap):
            return min(b, cap)
    return cap


def _t_bucket(max_hn: int) -> int:
    """Smallest ray-length bucket covering the measured longest hit (+2
    margin). The reference marches each ray serially until it hits or
    exits (ccv_swt.c:75-135) — its work is proportional to actual stroke
    widths; marching every lane a fixed 70 steps made the batched program
    pay 4-5x the necessary gather volume on thin-stroke text."""
    for t in _T_BUCKETS:
        if t >= max_hn + 2:
            return t
    return MAX_RAY


def _m_bucket(total: int, n_rays: int, T: int) -> int:
    """Path-slot count from the measured live stroke cells (+25% slack),
    in 8192 steps; capped at the worst case."""
    cap = min((T + 1) * 6 * n_rays, 24 * n_rays)
    want = -(-int(total * 1.25 + 1024) // 8192) * 8192
    return min(want, cap)


_LANES = 128


def _chunked(m2d):
    """Pad a 2-D map to a whole number of 128-lane chunks and reshape to
    (rows*chunks, 128) so point lookups become ROW gathers: on TPU an
    axis-0 row take streams at HBM rate while an element gather costs
    ~8 ns per index regardless of payload (measured: 2.6 M element probes
    20.6 ms; 147 k x 128-lane row reads unmeasurably fast)."""
    Hm, Wm = m2d.shape
    nc = -(-Wm // _LANES)
    mp = jnp.pad(m2d, ((0, 0), (0, nc * _LANES - Wm)))
    return mp.reshape(Hm * nc, _LANES), nc


def _cgather(mc, nc, ys, xs):
    """mc: _chunked map; read m2d[ys, xs] for index arrays of any shape
    via one row gather + an in-register lane select."""
    pos = ys * (nc * _LANES) + xs
    rows = jnp.take(mc, (pos // _LANES).reshape(-1), axis=0)
    lane = (pos % _LANES).reshape(-1)
    sel = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) == lane[:, None]
    return jnp.where(sel, rows, 0).sum(axis=1).reshape(pos.shape)


@partial(jax.jit, static_argnames=("n_rays", "T", "m_slots"))
def _swt_rays_both(c: jax.Array, dx: jax.Array, dy: jax.Array, n_rays: int,
                   T: int = MAX_RAY, m_slots: Optional[int] = None,
                   gray8=None):
    """Stroke-width maps for BOTH polarities in one program.

    Six ray families (2 polarities x {direct, +rot, -rot}, ccv_swt.c:86)
    march batched on one axis; the two polarities paint into disjoint
    halves of a single scatter buffer. Returns ((2, H, W) uint8 maps
    (DARK_TO_BRIGHT first; stroke widths are bounded by the ray cap so
    they fit u8), stats int32[3] = [unresolved rays, longest hit,
    live path cells]) — the stats drive the T / lane / slot rebucketing
    in detect_words, which re-runs bigger on any overflow.

    Every point lookup (hit probes, the 5-cross refine, the 9-point
    gradient opposition, the median's path reads) goes through _cgather
    (row gather + lane select) and every per-ray parameter read on the
    path slots goes through ONE row gather of a packed parameter table —
    element gathers at these index counts were 40+ ms of the program.
    """
    H, W = c.shape
    N = n_rays
    F = 6
    imax = jnp.iinfo(jnp.int32).max
    cb = c != 0
    dxf = dx.astype(jnp.int32)
    dyf = dy.astype(jnp.int32)

    def shift(arr, di, dj):
        return jnp.pad(arr, 1)[1 + di:1 + di + H, 1 + dj:1 + dj + W]

    # cross-dilated edge map: dil[y, x] == any of the 5-probe at (x, y),
    # so hit testing needs one probe instead of five (ccv_swt.c:71-74)
    dil = cb | shift(cb, 0, 1) | shift(cb, 0, -1) \
        | shift(cb, 1, 0) | shift(cb, -1, 0)
    dil_c, dil_nc = _chunked(jnp.pad(dil, 1).astype(jnp.int32))
    c_c, c_nc = _chunked(jnp.pad(cb, 1).astype(jnp.int32))
    # gradients packed into one word so the 9-point opposition check is
    # one probe per point: word = (dx+4096)*8192 + (dy+4096), |sobel| < 4096
    gpack = (jnp.pad(dxf, 1) + 4096) * 8192 + (jnp.pad(dyf, 1) + 4096)
    g_c, g_nc = _chunked(gpack)

    def py1(ys):
        return (ys + 1).clip(0, H + 1)

    def px1(xs):
        return (xs + 1).clip(0, W + 1)

    # -- compact edge pixels into ray lanes --------------------------------
    flat_edge = cb.reshape(-1)
    (ridx,) = jnp.nonzero(flat_edge, size=N, fill_value=0)
    lane = jnp.arange(N) < flat_edge.sum()
    ox = (ridx % W).astype(jnp.int32)
    oy = (ridx // W).astype(jnp.int32)
    gdx = dxf.reshape(-1)[ridx]
    gdy = dyf.reshape(-1)[ridx]

    # family axis: polarity {+1, -1} x rotation {(1,0,0,1),(1,-1,1,1),(1,1,-1,1)}
    dirs = jnp.array([1, 1, 1, -1, -1, -1], jnp.int32)[:, None]
    xx = jnp.array([1, 1, 1] * 2, jnp.int32)[:, None]
    xy = jnp.array([0, -1, 1] * 2, jnp.int32)[:, None]
    yx = jnp.array([0, 1, -1] * 2, jnp.int32)[:, None]
    yy = jnp.array([1, 1, 1] * 2, jnp.int32)[:, None]
    rdx = gdx[None] * xx + gdy[None] * xy        # (F, N)
    rdy = gdx[None] * yx + gdy[None] * yy
    adx = jnp.abs(rdx)
    ady = jnp.abs(rdy)
    sx = jnp.where(rdx > 0, -1, 1) * dirs
    sy = jnp.where(rdy > 0, -1, 1) * dirs

    # -- closed-form Bresenham positions -----------------------------------
    # The reference's err-update recurrence (ccv_swt.c:75-84) reduces to:
    # major axis advances every step, minor follows the ceil staircase
    # max(0, ceil((2 t mnr - maj) / (2 maj))) — verified exhaustively
    # against the recurrence. No serial march at all.
    maj = jnp.maximum(adx, ady)
    mnr = jnp.minimum(adx, ady)
    xmaj = adx >= ady
    majs = jnp.maximum(maj, 1)
    t = jax.lax.broadcasted_iota(jnp.int32, (T, F, N), 0) + 1   # t = 1..T
    stepmaj = jnp.where(maj[None] > 0, t, 0)
    stepmin = jnp.maximum(
        0, (2 * t * mnr[None] + maj[None] - 1) // (2 * majs[None]))
    xs = ox[None, None] + sx[None] * jnp.where(xmaj[None], stepmaj, stepmin)
    ys = oy[None, None] + sy[None] * jnp.where(xmaj[None], stepmin, stepmaj)

    # -- hit detection: chunked probes of the dilated map -------------------
    inb = (xs >= 1) & (xs < W - 1) & (ys >= 1) & (ys < H - 1)
    # associative_scan, NOT jnp.cumsum: cumsum/cummax lower to quadratic
    # reduce-windows on TPU
    alive = jax.lax.associative_scan(
        jnp.add, (~inb).astype(jnp.int32), axis=0) == 0
    far = (jnp.abs(ys - oy[None, None]) >= 2) \
        | (jnp.abs(xs - ox[None, None]) >= 2)
    found = _cgather(dil_c, dil_nc, py1(ys), px1(xs)) != 0
    cand = alive & far & found
    hit = cand.any(0)
    s_hit = jnp.argmax(cand, axis=0)              # first True
    hn = jnp.where(hit, s_hit + 1, 0)             # increments to the hit
    # one-hot selects along T (take_along_axis is an element gather)
    t_sel = jax.lax.broadcasted_iota(jnp.int32, (T, F, N), 0)
    sel_hit = t_sel == s_hit[None]
    hx0 = jnp.sum(jnp.where(sel_hit, xs, 0), axis=0)
    hy0 = jnp.sum(jnp.where(sel_hit, ys, 0), axis=0)
    # refine to the first-matching probe of the 5-cross (order of _DX5)
    kx, ky = hx0, hy0
    fnd = jnp.zeros((F, N), bool)
    for k in range(5):
        nx = hx0 + int(_DX5[k])
        ny = hy0 + int(_DY5[k])
        val = _cgather(c_c, c_nc, py1(ny), px1(nx)) != 0
        sel = val & ~fnd
        kx = jnp.where(sel, nx, kx)
        ky = jnp.where(sel, ny, ky)
        fnd = fnd | val
    # ray stop position: first hit or out-of-bounds step, else last
    stop = (~inb) | cand
    s_stop = jnp.where(stop.any(0), jnp.argmax(stop, axis=0), T - 1)
    sel_stop = t_sel == s_stop[None]
    x1 = jnp.sum(jnp.where(sel_stop, xs, 0), axis=0)
    y1 = jnp.sum(jnp.where(sel_stop, ys, 0), axis=0)

    # -- gradient opposition at the hit (ccv_swt.c:137-155) ----------------
    ok = hit & (kx > 0) & (kx < W - 1) & (ky > 0) & (ky < H - 1)
    opp = jnp.zeros((F, N), bool)
    for k in range(9):
        qw = _cgather(g_c, g_nc, py1(ky + int(_DY9[k])),
                      px1(kx + int(_DX9[k])))
        gx = qw // 8192 - 4096
        gy = qw % 8192 - 4096
        tn = gdy[None] * gx - gdx[None] * gy
        td = gdx[None] * gx + gdy[None] * gy
        opp = opp | ((tn * 7 < -td * 4) & (tn * 7 > td * 4))
    d2 = (x1 - ox[None]) ** 2 + (y1 - oy[None]) ** 2
    w = jnp.round(jnp.sqrt(d2.astype(jnp.float32))).astype(jnp.int32)
    valid = ok & opp & lane[None]

    # overflow stats: rays still marching (in-bounds, unhit) at the T cap
    # would hit later — the host re-runs at a bigger T bucket; rays with
    # zero gradient can never resolve and don't count
    unresolved = (lane[None] & (maj > 0) & ~stop.any(0)).sum(dtype=jnp.int32)
    if T >= MAX_RAY:
        unresolved = jnp.int32(0)
    max_hn = jnp.max(jnp.where(valid, hn, 0)).astype(jnp.int32)

    # -- compact path slots: per-ray contiguous ranges ---------------------
    # Only ~(edge count x mean stroke width) path cells carry scatter
    # updates. Each valid ray owns a contiguous slot range [start, start +
    # hn]; a slot recovers its ray by stamp + scan-max into the monotone
    # starts — so the compaction needs no dense-mask nonzero (which lowers
    # to a multi-ms scatter on TPU).
    FN = F * N
    pol = (jnp.arange(F, dtype=jnp.int32) // 3)[None, :, None]
    npath = jnp.where(valid, hn + 1, 0).astype(jnp.int32).reshape(-1)
    starts = jax.lax.associative_scan(jnp.add, npath) - npath  # exclusive
    total = starts[-1] + npath[-1]
    M = min((T + 1) * FN, 24 * N)                   # overflow drops strokes
    if m_slots is not None:
        M = min(M, m_slots)
    m = jnp.arange(M, dtype=jnp.int32)
    # slot -> ray: every valid ray stamps (id+1) at its start slot (starts
    # are strictly increasing over valid rays, so indices are unique) and
    # a scan-max propagates ownership — O(log) depth, no binary search
    ray_ids = jnp.arange(FN, dtype=jnp.int32)
    stamp = jnp.zeros((M + 1,), jnp.int32).at[
        jnp.where((npath > 0) & (starts < M), starts, M)].max(ray_ids + 1)
    r = (jax.lax.associative_scan(jnp.maximum, stamp[:M]) - 1).clip(
        0, FN - 1)
    # per-slot ray parameters: ONE row gather of a packed table (vs eight
    # element gathers of (M,) each)
    oxf = jnp.broadcast_to(ox[None], (F, N)).reshape(-1)
    oyf = jnp.broadcast_to(oy[None], (F, N)).reshape(-1)
    P = jnp.stack([maj.reshape(-1), mnr.reshape(-1), sx.reshape(-1),
                   sy.reshape(-1), xmaj.reshape(-1).astype(jnp.int32),
                   w.reshape(-1), starts, oxf, oyf, npath,
                   (hn // 2).reshape(-1)], axis=1)            # (FN, 11)
    Pr = jnp.take(P, r, axis=0)                               # (M, 11)
    majr, mnrr = Pr[:, 0], Pr[:, 1]
    sxr, syr, xmajr = Pr[:, 2], Pr[:, 3], Pr[:, 4] != 0
    wr, startr = Pr[:, 5], Pr[:, 6]
    oxr, oyr = Pr[:, 7], Pr[:, 8]
    npathr, kr = Pr[:, 9], Pr[:, 10]
    tslot = (m - startr).clip(0, T)
    live = m < total
    smaj = jnp.where(majr > 0, tslot, 0)
    smin = jnp.maximum(
        0, (2 * tslot * mnrr + majr - 1) // (2 * jnp.maximum(majr, 1)))
    xm = oxr + sxr * jnp.where(xmajr, smaj, smin)
    ym = oyr + syr * jnp.where(xmajr, smin, smaj)
    tgt_c = jnp.where(live, (r // (3 * N)) * (H * W) + ym * W + xm,
                      2 * H * W)                    # sentinel slot if dead
    painted = jnp.full((2 * H * W + 1,), imax, jnp.int32).at[
        tgt_c].min(wr)
    swt_flat = jnp.where(painted[:2 * H * W] == imax, 0,
                         painted[:2 * H * W])

    # -- median rewrite pass (max-width-wins; see module docstring) --------
    # rank-(hn//2) select by binary search over the value range, computed
    # PER SLOT: each ray's path values are exactly its slot segment's
    # post-paint reads, so the per-round below-counts are segmented sums
    # over the (M,) slot axis (3 log-depth scans each) instead of a
    # (T+1, F, N) path gather — 147 k probes replace 2.66 M.
    pad2 = (-(2 * H * W + 1)) % _LANES
    swt_pad = jnp.pad(swt_flat, (0, pad2 + 1)).reshape(-1, _LANES)
    v = _cgather(swt_pad, 1, tgt_c // _LANES, tgt_c % _LANES)  # (M,)
    is_start = (m == startr) & live
    is_end = (tslot == npathr - 1) & live

    def seg_combine(a_, b_):
        fa, va = a_
        fb, vb = b_
        return fa | fb, jnp.where(fb, vb, va)

    med = jnp.zeros((M,), jnp.int32)
    for bit in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        mid = med + bit
        below = (live & (v < mid)).astype(jnp.int32)
        pre = jax.lax.associative_scan(jnp.add, below)      # inclusive
        _, base = jax.lax.associative_scan(
            seg_combine, (is_start, jnp.where(is_start, pre - below, 0)))
        _, tot = jax.lax.associative_scan(
            seg_combine, (is_end, jnp.where(is_end, pre, 0)), reverse=True)
        med = jnp.where(tot - base <= kr, mid, med)
    pk_slot = jnp.where(live, wr * 1024 + med, 0)
    packed = jnp.zeros((2 * H * W + 1,), jnp.int32).at[
        tgt_c].max(pk_slot)
    packed = packed[:2 * H * W]
    out = jnp.where(packed > 0, packed % 1024, swt_flat)
    out = out.reshape(2, H, W).astype(jnp.uint8)
    if gray8 is not None:
        # ride the gray plane along so the host needs a single fetch
        out = jnp.concatenate([out, gray8[None]], axis=0)
    npaint = jnp.sum(swt_flat > 0, dtype=jnp.int32)
    stats = jnp.stack([unresolved, max_hn, total, npaint])
    return out, stats


def swt_map(c: jax.Array, dx: jax.Array, dy: jax.Array, direction: int):
    """Stroke-width map for one polarity. c: closed edge map (H, W) nonzero;
    dx/dy: int32 sobel. Returns int32 (H, W) stroke widths (0 = none)."""
    H, W = c.shape
    both, _ = _swt_rays_both(c, dx, dy, _ray_lanes(H * W))
    return both[0 if direction == 1 else 1].astype(jnp.int32)


@partial(jax.jit, static_argnames=("size", "low", "high"))
def _swt_frontend(pyr: jax.Array, size: int, low: int, high: int):
    """Edge/gradient front-end as one program: sobel + canny +
    close_outline (+ edge count for lane bucketing, + u8 gray for the
    host letter stage). XLA CSEs the sobel shared with canny."""
    dx = basic.sobel(pyr, size, 0)
    dy = basic.sobel(pyr, 0, size)
    c = classic.close_outline(classic.canny(pyr, size, low, high))
    return (c.astype(jnp.uint8), dx.astype(jnp.int32),
            dy.astype(jnp.int32),
            (c != 0).reshape(-1).sum(dtype=jnp.int32),
            jnp.clip(pyr, 0, 255).astype(jnp.uint8))



@jax.jit
def _connected_components(swt: jax.Array, ratio: int = 3):
    """8-connected labeling where neighbor widths are within `ratio` x.

    Iterative min-label propagation to fixpoint (the reference's BFS uses a
    running component average, ccv_swt.c:262-281; the pairwise rule is the
    standard SWT formulation and agrees on detection-level output).
    """
    H, W = swt.shape
    fg = swt > 0
    idx = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
    big = H * W + 7
    labels = jnp.where(fg, idx, big)
    swp = jnp.pad(swt, 1)

    shifts = [(-1, 0), (1, 0), (0, -1), (0, 1), (-1, -1), (-1, 1), (1, -1), (1, 1)]

    def nb(arr, di, dj, fill):
        ap = jnp.pad(arr, 1, constant_values=fill)
        return jax.lax.dynamic_slice(ap, (1 + di, 1 + dj), (H, W))

    def body(state):
        labels, _ = state
        new = labels
        for di, dj in shifts:
            nl = nb(labels, di, dj, big)
            nw = nb(swt, di, dj, 0)
            join = fg & (nw > 0) & (nw <= ratio * swt) & (nw * ratio >= swt)
            new = jnp.where(join, jnp.minimum(new, nl), new)
        # pointer jumping: labels index pixels of the same component, so
        # label[label] is also in-component; two hops per sweep turn the
        # O(diameter) propagation into O(log) with an identical fixpoint
        # (chunked row-gather: an element gather here costs ~8 ns x HW
        # per hop)
        for _ in range(2):
            lc, lnc = _chunked(new.reshape(1, -1))
            tgt = new.clip(0, H * W - 1)
            new = jnp.where(
                fg, jnp.minimum(new, _cgather(lc, lnc,
                                              jnp.zeros_like(tgt), tgt)),
                new)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(lambda s: s[1], body,
                                   (labels, jnp.bool_(True)))
    return jnp.where(fg, labels, -1)


_LETTER_CAP = 512   # candidate components, both polarities (device path)
_KEPT_CAP = 128     # letters surviving the scalar filters (occlusion stage)
_P_BUCKETS = (16384, 32768, 65536, 131072)


def _p_bucket(npaint: int) -> int:
    for b in _P_BUCKETS:
        if b >= npaint:
            return b
    return _P_BUCKETS[-1]


def _compact_strokes_pbucket(npaint: int) -> int:
    for b in (8192, 16384, 24576, 32768, 49152, 65536, 98304, 131072,
              196608, 262144):
        if b >= npaint:
            return b
    return 262144


@partial(jax.jit, static_argnames=("P",))
def _compact_strokes(packed3, P: int):
    """Compact both polarities' stroke cells to (pos<<7 | width) i32 +
    gray u8 lanes: ~160 KB crosses the link instead of the 0.92 MB
    (3, H, W) planes (the tunnel transfer dominated the whole detect).
    packed3: the ray program's (3, H, W) uint8 output (2 stroke maps +
    the gray plane)."""
    H, W = packed3.shape[1], packed3.shape[2]
    HW = H * W
    flat = packed3[:2].reshape(-1).astype(jnp.int32)
    fg = flat > 0
    (pidx,) = jnp.nonzero(fg, size=P, fill_value=2 * HW)
    valid = pidx < 2 * HW
    safe = pidx.clip(0, 2 * HW - 1)
    val = jnp.where(valid, _tab_gather(flat, safe), 0)
    g = jnp.where(valid,
                  _tab_gather(packed3[2].reshape(-1).astype(jnp.int32),
                              safe % HW), 0)
    packed = jnp.where(valid, safe * 128 + val.clip(0, 127), -1)
    return packed.astype(jnp.int32), g.astype(jnp.uint8)


def _tab_gather(tab, idx):

    """Point reads of a small 1-D table via the chunked row-gather."""
    pad = (-tab.shape[0]) % _LANES
    tc = jnp.pad(tab, (0, pad)).reshape(-1, _LANES)
    return _cgather(tc, 1, idx // _LANES, idx % _LANES)


@partial(jax.jit, static_argnames=("P", "min_height", "max_height",
                                   "min_area", "aspect_ratio", "std_ratio"))
def _letters_device(swt2, gray8, P: int, min_height: int, max_height: int,
                    min_area: int, aspect_ratio: float, std_ratio: float):
    """_ccv_swt_connected_letters on the DEVICE, over COMPACTED stroke
    pixels: both polarities' nonzero stroke cells (~30 k at VGA vs the
    614 k dense grid) compact into P lanes; connected components run as
    min-label propagation + pointer jumping on the precomputed 8-neighbor
    index table (the dense-grid variant measured 79 ms/polarity — every
    sweep re-gathered the full image); per-component statistics are row
    scatter-adds into (P+1)-row tables; the occlusion pre-count is a
    direct pixel-in-bbox test against the <=128 kept letters (no SAT).
    Only (K, 13) letter rows cross to the host instead of the (3, H, W)
    planes (0.92 MB at VGA — the measured tunnel transfer dominated the
    whole detect).

    Returns (letters (K, 13) f32 rows [valid, pol, x, y, w, h, thickness,
    intensity, mean, std, nocc, cx, cy], counts (3,) i32 [painted cells,
    candidate components, kept letters]) — counts drive the host's
    P-bucket re-run / plane-path fallback.
    """
    H, W = swt2.shape[1], swt2.shape[2]
    HW = H * W
    K = _LETTER_CAP
    K2 = _KEPT_CAP
    ratio = 3
    flat = swt2.reshape(-1)                        # (2HW,) int32
    fg = flat > 0
    npaint = jnp.sum(fg, dtype=jnp.int32)
    (pidx,) = jnp.nonzero(fg, size=P, fill_value=2 * HW)
    valid = jnp.arange(P) < npaint
    pv = jnp.where(valid, _tab_gather(flat, pidx.clip(0, 2 * HW - 1)), 0)
    pos = pidx % HW
    pol = (pidx // HW).clip(0, 1)
    y = pos // W
    x = pos % W
    grayp = jnp.where(valid,
                      _tab_gather(gray8.reshape(-1).astype(jnp.int32),
                                  pos.clip(0, HW - 1)), 0)
    # inverse map pixel -> lane, then the 8-neighbor lane/join tables
    inv = jnp.full((2 * HW + 1,), -1, jnp.int32).at[pidx].set(
        jnp.arange(P, dtype=jnp.int32))
    own = jnp.arange(P, dtype=jnp.int32)
    nbs = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            ny_, nx_ = y + dy, x + dx
            inb = (ny_ >= 0) & (ny_ < H) & (nx_ >= 0) & (nx_ < W) & valid
            npos = (pol * HW + ny_.clip(0, H - 1) * W
                    + nx_.clip(0, W - 1))
            nidx = _tab_gather(inv, npos)
            nval = jnp.where(nidx >= 0,
                             _tab_gather(pv, nidx.clip(0, P - 1)), 0)
            join = (inb & (nidx >= 0) & (nval > 0)
                    & (nval <= ratio * pv) & (pv <= ratio * nval))
            nbs.append(jnp.where(join, nidx, own))
    nb = jnp.stack(nbs, axis=1)                     # (P, 8)

    def body(state):
        lbl, _ = state
        g = _tab_gather(lbl, nb.reshape(-1)).reshape(P, 8)
        new = jnp.minimum(lbl, jnp.min(g, axis=1))
        for _ in range(3):
            new = jnp.minimum(new, _tab_gather(new, new))
        return new, jnp.any(new != lbl)

    lbl, _ = jax.lax.while_loop(lambda s: s[1], body,
                                (own, jnp.bool_(True)))
    lblk = jnp.where(valid, lbl, P)

    # per-component statistics (tables keyed by the root lane index)
    vf = pv.astype(jnp.float32)
    fgf = valid.astype(jnp.float32)
    cnt = jnp.zeros((P + 1,), jnp.int32).at[lblk].add(
        valid.astype(jnp.int32))
    big = jnp.int32(1 << 30)
    mn = jnp.full((P + 1, 2), big).at[lblk].min(jnp.stack(
        [jnp.where(valid, x, big), jnp.where(valid, y, big)], axis=1))
    mx = jnp.full((P + 1, 2), -big).at[lblk].max(jnp.stack(
        [jnp.where(valid, x, -big), jnp.where(valid, y, -big)], axis=1))
    # moments centered on the component bbox origin (raw f32 x^2 sums at
    # VGA magnitudes lose ~8 bits; centered they stay exact enough)
    x0p = _tab_gather(mn[:, 0], lblk)
    y0p = _tab_gather(mn[:, 1], lblk)
    xr = (x - x0p).astype(jnp.float32) * fgf
    yr = (y - y0p).astype(jnp.float32) * fgf
    payload = jnp.stack([xr, yr, xr * xr, yr * yr, xr * yr,
                         vf * fgf, vf * vf * fgf,
                         grayp.astype(jnp.float32) * fgf], axis=1)
    sums = jnp.zeros((P + 1, 8), jnp.float32).at[lblk].add(payload)
    hist = jnp.zeros((P + 1, 128), jnp.float32).at[lblk].add(
        jax.nn.one_hot(pv.clip(0, 127), 128) * fgf[:, None])

    # compact the component table: top-K by size among >= min_area
    score = jnp.where(cnt[:P] >= min_area, cnt[:P], -1)
    topv, kidx = jax.lax.top_k(score, K)
    cand = topv > 0
    n_cand = jnp.sum((cnt[:P] >= min_area).astype(jnp.int32))
    S = jnp.take(sums, kidx, axis=0)
    C = jnp.take(cnt, kidx, axis=0).astype(jnp.float32)
    Cs = jnp.maximum(C, 1.0)
    bx0 = jnp.take(mn[:, 0], kidx)
    by0 = jnp.take(mn[:, 1], kidx)
    bx1 = jnp.take(mx[:, 0], kidx)
    by1 = jnp.take(mx[:, 1], kidx)
    Hst = jnp.take(hist, kidx, axis=0)
    polk = _tab_gather(pol, kidx)                  # polarity of the root
    width = (bx1 - bx0 + 1).astype(jnp.float32)
    height = (by1 - by0 + 1).astype(jnp.float32)
    keep = cand & (height >= min_height) & (height <= max_height)
    ar = width / height
    keep &= (ar >= 1.0 / aspect_ratio) & (ar <= aspect_ratio)
    xc = S[:, 0] / Cs
    yc = S[:, 1] / Cs
    af = S[:, 2] / Cs - xc * xc
    bf = 2.0 * (S[:, 4] / Cs - xc * yc)
    cf = S[:, 3] / Cs - yc * yc
    delta = jnp.sqrt(bf * bf + (af - cf) ** 2)
    mom = jnp.sqrt((af + cf + delta)
                   / jnp.maximum(af + cf - delta, 1e-12))
    keep &= (mom >= 1.0 / aspect_ratio) & (mom <= aspect_ratio)
    mean = S[:, 5] / Cs
    var = S[:, 6] / Cs - mean * mean
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    keep &= std <= mean * std_ratio
    # thickness: value at rank (cnt-1)//2 of the sorted widths
    cum = jnp.cumsum(Hst, axis=1)
    rank = jnp.floor((C - 1.0) / 2.0) + 1.0
    med = jnp.argmax(cum >= rank[:, None], axis=1).astype(jnp.float32)
    inten = jnp.floor(S[:, 7] / Cs)
    n_kept = jnp.sum(keep.astype(jnp.int32))

    # occlusion pre-count: pixel-in-bbox tests against the kept letters
    # (same-polarity, exact — mirrors the reference's lab_img scan,
    # ccv_swt.c:368-399)
    kscore = jnp.where(keep, C, -1.0)
    _, kk = jax.lax.top_k(kscore, K2)              # rows into the K table
    kvalid = jnp.take(keep, kk)
    klab = jnp.take(kidx, kk)                      # component root lanes
    invk = jnp.full((P + 1,), -1, jnp.int32).at[
        jnp.where(kvalid, klab, P)].max(jnp.arange(K2, dtype=jnp.int32))
    j2 = _tab_gather(invk, lblk)                   # (P,) kept row or -1
    j2 = jnp.where(j2 < 0, K2, j2)
    kx0 = jnp.take(bx0, kk)
    ky0 = jnp.take(by0, kk)
    kx1 = jnp.take(bx1, kk)
    ky1 = jnp.take(by1, kk)
    kpol = jnp.take(polk, kk)
    inbox = (valid[:, None] & kvalid[None, :]
             & (pol[:, None] == kpol[None, :])
             & (x[:, None] >= kx0[None, :]) & (x[:, None] <= kx1[None, :])
             & (y[:, None] >= ky0[None, :]) & (y[:, None] <= ky1[None, :]))
    presence = jnp.zeros((K2 + 1, K2), jnp.float32).at[j2].max(
        inbox.astype(jnp.float32))[:K2]            # [j, k]
    self_mask = jnp.arange(K2)[:, None] == jnp.arange(K2)[None, :]
    nocc = jnp.sum(presence * (~self_mask) * kvalid[:, None].astype(
        jnp.float32), axis=0)
    noccK = jnp.zeros((K + 1,), jnp.float32).at[
        jnp.where(kvalid, kk, K)].max(nocc)[:K]
    rows = jnp.stack([
        keep.astype(jnp.float32), polk.astype(jnp.float32),
        bx0.astype(jnp.float32), by0.astype(jnp.float32), width, height,
        med, inten, mean, std, noccK,
        bx0.astype(jnp.float32) + jnp.floor(width / 2),
        by0.astype(jnp.float32) + jnp.floor(height / 2)], axis=1)
    return rows, jnp.stack([npaint, n_cand, n_kept])


def _cc_host(swt_np: np.ndarray, ratio: int = 3) -> np.ndarray:
    """Width-ratio-gated 8-connected components on the host.

    Same join rule as `_connected_components` (neighbor widths within
    `ratio`x). Fast path: the native C++ union-find
    (native/ccv_tpu_swt.cpp, ~1 ms per VGA polarity — the MSER pattern);
    fallback: scipy's sparse-graph components (measured 16 ms).
    """
    from ccv_tpu.core import native

    lib = native.load()
    if lib is not None and hasattr(lib, "ccv_tpu_swt_cc"):
        import ctypes

        if not getattr(lib.ccv_tpu_swt_cc, "_configured", False):
            lib.ccv_tpu_swt_cc.restype = ctypes.c_int
            lib.ccv_tpu_swt_cc.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
            lib.ccv_tpu_swt_cc._configured = True
        s8 = np.ascontiguousarray(swt_np, np.uint8)
        Hh, Ww = s8.shape
        labels = np.empty((Hh, Ww), np.int32)
        ncomp = lib.ccv_tpu_swt_cc(
            s8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), Hh, Ww,
            ratio, labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if ncomp >= 0:
            return labels

    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    s = swt_np.astype(np.int32)
    H, W = s.shape
    fg = s > 0
    idx = np.arange(H * W, dtype=np.int32).reshape(H, W)
    rows, cols = [], []
    for di, dj in ((0, 1), (1, 0), (1, 1), (1, -1)):
        i0, i1 = max(0, -di), H - max(0, di)
        j0, j1 = max(0, -dj), W - max(0, dj)
        A = s[i0:i1, j0:j1]
        B = s[i0 + di:i1 + di, j0 + dj:j1 + dj]
        m = (A > 0) & (B > 0) & (B <= ratio * A) & (A <= ratio * B)
        rows.append(idx[i0:i1, j0:j1][m])
        cols.append(idx[i0 + di:i1 + di, j0 + dj:j1 + dj][m])
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    g = sp.coo_matrix((np.ones(len(r), np.int8), (r, c)),
                      shape=(H * W, H * W))
    _, lab = connected_components(g, directed=False)
    return np.where(fg, lab.reshape(H, W), -1)


def _letters_from_components(image_gray: np.ndarray, swt: np.ndarray,
                             labels: np.ndarray, params: SwtParams):
    """_ccv_swt_connected_letters twin (host, vectorized numpy)."""
    H, W = swt.shape
    flat = labels.reshape(-1)
    fg = flat >= 0
    if not fg.any():
        return []
    ids, inv = np.unique(flat[fg], return_inverse=True)
    n = len(ids)
    ys, xs = np.divmod(np.nonzero(fg)[0], W)
    vals = swt.reshape(-1)[fg].astype(np.float64)
    size = np.bincount(inv, minlength=n)
    x0 = np.full(n, W, np.int64); np.minimum.at(x0, inv, xs)
    x1 = np.zeros(n, np.int64); np.maximum.at(x1, inv, xs)
    y0 = np.full(n, H, np.int64); np.minimum.at(y0, inv, ys)
    y1 = np.zeros(n, np.int64); np.maximum.at(y1, inv, ys)
    width = x1 - x0 + 1
    height = y1 - y0 + 1
    # size/area/height gates (_ccv_swt_connected_component tail)
    keep = ((height >= params.min_height) & (height <= params.max_height)
            & (size >= params.min_area))
    # aspect ratio of the bbox
    ar = width / height
    keep &= (ar >= 1.0 / params.aspect_ratio) & (ar <= params.aspect_ratio)
    # second-moment elongation ratio
    m10 = np.bincount(inv, xs, n); m01 = np.bincount(inv, ys, n)
    m20 = np.bincount(inv, xs.astype(np.float64) ** 2, n)
    m02 = np.bincount(inv, ys.astype(np.float64) ** 2, n)
    m11 = np.bincount(inv, xs.astype(np.float64) * ys, n)
    xc, yc = m10 / size, m01 / size
    af = m20 / size - xc * xc
    bf = 2 * (m11 / size - xc * yc)
    cf = m02 / size - yc * yc
    delta = np.sqrt(bf * bf + (af - cf) ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        mom_ratio = np.sqrt((af + cf + delta) / np.maximum(af + cf - delta, 1e-12))
    keep &= (mom_ratio >= 1.0 / params.aspect_ratio) & (mom_ratio <= params.aspect_ratio)
    # stroke-width statistics
    mean = np.bincount(inv, vals, n) / size
    var = np.bincount(inv, vals * vals, n) / size - mean ** 2
    std = np.sqrt(np.maximum(var, 0))
    keep &= std <= mean * params.std_ratio

    kept_ids = np.nonzero(keep)[0]
    if len(kept_ids) == 0:
        return []
    # occlusion filter: letter bbox may contain pixels of at most
    # letter_occlude_thresh other letters (ccv_swt.c:368-399)
    remap = np.full(n, -1)
    remap[kept_ids] = np.arange(len(kept_ids))
    lab_img = np.full((H, W), -1, np.int64)
    lab_img.reshape(-1)[fg] = remap[inv]
    final = []
    gray = image_gray
    # intensity per component (mean gray over pixels)
    inten = np.bincount(inv, gray.reshape(-1)[fg].astype(np.float64), n)
    inten = (inten / size).astype(np.int64)
    # thickness: median stroke width per component
    order = np.lexsort((vals, inv))
    sorted_vals = vals[order]
    starts = np.searchsorted(inv[order], np.arange(n))
    for row, comp in enumerate(kept_ids):
        bx0, bx1, by0, by1 = x0[comp], x1[comp], y0[comp], y1[comp]
        sub = lab_img[by0:by1 + 1, bx0:bx1 + 1]
        others = np.unique(sub[(sub >= 0) & (sub != row)])
        if params.letter_occlude_thresh and len(others) > params.letter_occlude_thresh:
            continue
        s, c = starts[comp], size[comp]
        med = sorted_vals[s + (c - 1) // 2]
        final.append(dict(
            x=int(bx0), y=int(by0), width=int(width[comp]), height=int(height[comp]),
            cx=int(bx0) + int(width[comp]) // 2, cy=int(by0) + int(height[comp]) // 2,
            thickness=int(med), intensity=int(inten[comp]),
            mean=float(mean[comp]), std=float(std[comp])))
    return final


def _merge_textline(letters: List[dict], params: SwtParams) -> List[dict]:
    """_ccv_swt_merge_textline twin (ccv_swt.c:499)."""
    pairs = []
    for i in range(len(letters) - 1):
        li = letters[i]
        for j in range(i + 1, len(letters)):
            lj = letters[j]
            r = li["thickness"] / max(lj["thickness"], 1e-9)
            if r > params.thickness_ratio or r < 1.0 / params.thickness_ratio:
                continue
            r = li["height"] / lj["height"]
            if r > params.height_ratio or r < 1.0 / params.height_ratio:
                continue
            if abs(li["intensity"] - lj["intensity"]) > params.intensity_thresh:
                continue
            dx = li["x"] - lj["x"] + (li["width"] - lj["width"]) // 2
            dy = li["y"] - lj["y"] + (li["height"] - lj["height"]) // 2
            if abs(dx) > params.distance_ratio * max(li["width"], lj["width"]):
                continue
            oy = min(li["y"] + li["height"], lj["y"] + lj["height"]) - max(li["y"], lj["y"])
            if oy * params.intersect_ratio < min(li["height"], lj["height"]):
                continue
            pairs.append(dict(left=i, right=j, dx=dx, dy=dy))
    if not pairs:
        return []

    def same(p1, p2):
        tn = p1["dy"] * p2["dx"] - p1["dx"] * p2["dy"]
        td = p1["dx"] * p2["dx"] + p1["dy"] * p2["dy"]
        if p1["left"] == p2["left"] or p1["right"] == p2["right"]:
            return tn * 7 < -td * 4 and tn * 7 > td * 4
        if p1["left"] == p2["right"] or p1["right"] == p2["left"]:
            return tn * 7 < td * 4 and tn * 7 > -td * 4
        return False

    idx = group(pairs, same)
    nchains = max(idx) + 1
    chains = [dict(members=set()) for _ in range(nchains)]
    for p, g in zip(pairs, idx):
        chains[g]["members"].add(p["left"])
        chains[g]["members"].add(p["right"])
    out = []
    for ch in chains:
        mem = [letters[m] for m in ch["members"]]
        if len(mem) < params.letter_thresh:
            continue
        x0 = min(l["x"] for l in mem)
        y0 = min(l["y"] for l in mem)
        x1 = max(l["x"] + l["width"] for l in mem)
        y1 = max(l["y"] + l["height"] for l in mem)
        if (x1 - x0) <= (y1 - y0) * params.elongate_ratio:
            continue
        out.append(dict(x=x0, y=y0, width=x1 - x0, height=y1 - y0,
                        letters=sorted(mem, key=lambda l: l["cx"])))
    return out


def _swt_group_textlines(textlines: List[dict], params: SwtParams):
    """Group overlapping textlines, keep the widest per group."""
    if not textlines:
        return textlines
    idx = group(textlines, lambda a, b: _same_textline(
        a, b, params.same_word_thresh))
    ngroups = max(idx) + 1
    best = [None] * ngroups
    for t, g in zip(textlines, idx):
        if best[g] is None or t["width"] > best[g]["width"]:
            best[g] = t
    return best


def _same_textline(t1, t2, thresh) -> bool:
    w = min(t1["x"] + t1["width"], t2["x"] + t2["width"]) - max(t1["x"], t2["x"])
    h = min(t1["y"] + t1["height"], t2["y"] + t2["height"]) - max(t1["y"], t2["y"])
    a1 = t1["width"] * t1["height"]
    a2 = t2["width"] * t2["height"]
    return (w > 0 and h > 0 and w * h > thresh[0] * max(a1, a2)
            and w * h > thresh[1] * min(a1, a2))


def _otsu_host(gaps: np.ndarray, range_: int):
    """numpy twin of ops.classic.otsu for the tiny (<100 element) gap
    arrays of _break_words: on the tunneled device each jitted otsu call
    is a serialized dispatch + sync fetch (~40 ms RTT) and this stage
    measured 149 ms of a 235 ms detect; on host it is microseconds."""
    flat = np.clip(gaps.astype(np.int64), 0, range_ - 1)
    hist = np.bincount(flat, minlength=range_)
    total = flat.size
    i = np.arange(range_, dtype=np.float64)
    sum_all = float(np.sum(i * hist))
    wB = np.cumsum(hist)
    sumB = np.cumsum(i * hist)
    wF = total - wB
    valid = (wB > 0) & (wF > 0)
    mB = sumB / np.maximum(wB, 1)
    mF = (sum_all - sumB) / np.maximum(wF, 1)
    var = np.where(valid, wB * wF * (mB - mF) ** 2, 0.0)
    threshold = int(np.argmax(var))  # first occurrence on ties
    return threshold, float(var[threshold]) / total / total


def _break_words(textlines: List[dict], params: SwtParams) -> List[dict]:
    """_ccv_swt_break_words twin: otsu over inter-letter gaps."""
    words = []
    for t in textlines:
        ls = t["letters"]
        if len(ls) < 2:
            words.append({k: t[k] for k in ("x", "y", "width", "height")})
            continue
        gaps = np.array([max(0, ls[j + 1]["x"] - (ls[j]["x"] + ls[j]["width"]))
                         for j in range(len(ls) - 1)], np.int32)
        rng = int(gaps.max()) + 1
        th, var = _otsu_host(gaps, rng)
        mean = gaps.mean()
        if math.sqrt(var) > mean * params.breakdown_ratio:
            cur = [ls[0]]
            for j in range(len(ls) - 1):
                if gaps[j] > th:
                    words.append(_bbox(cur))
                    cur = []
                cur.append(ls[j + 1])
            words.append(_bbox(cur))
        else:
            words.append({k: t[k] for k in ("x", "y", "width", "height")})
    return words


def _bbox(ls):
    x0 = min(l["x"] for l in ls)
    y0 = min(l["y"] for l in ls)
    x1 = max(l["x"] + l["width"] for l in ls)
    y1 = max(l["y"] + l["height"] for l in ls)
    return dict(x=x0, y=y0, width=x1 - x0, height=y1 - y0)


@partial(jax.jit, static_argnames=("n_rays", "T", "m_slots", "Pc", "size",
                                   "low", "high"))
def _swt_full(pyr, n_rays: int, T: int, m_slots: int, Pc: int, size: int,
              low: int, high: int):
    """Frontend + rays + stroke compaction as ONE program returning ONE
    i32 bundle [cnt, unresolved, max_hn, total, npaint, 0, 0, 0 | packed
    stroke lanes (Pc) | gray bytes (Pc/4 words)]. The tunneled device
    serializes RPCs, so the stepwise path's ~4 round trips per image cost
    ~120 ms of link latency; the steady state here is one dispatch + one
    fetch."""
    c, dx, dy, cnt, gray8 = _swt_frontend(pyr, size, low, high)
    packed3, stats = _swt_rays_both(c, dx, dy, n_rays, T=T,
                                    m_slots=m_slots, gray8=gray8)
    pk, g = _compact_strokes(packed3, Pc)
    g4 = jnp.sum(g.astype(jnp.int32).reshape(-1, 4)
                 * jnp.array([1, 256, 65536, 1 << 24], jnp.int32), axis=1)
    header = jnp.concatenate([cnt[None], stats,
                              jnp.zeros((3,), jnp.int32)])
    return jnp.concatenate([header, pk, g4])


_COUNT_HINT: dict = {}   # (H, W) -> last seen edge count (lane bucketing)
_EXECUTOR = None

# letter-stage route: "compact" ships ~160 KB of compacted stroke cells
# to the fast native host CC + numpy stats (default on accelerators —
# the on-device CC converges in ~39 label-propagation sweeps and costs
# more than the transfer it saves); "device" runs CC + stats + filters
# fully on-chip; "host" fetches the full planes (CPU-backend default).
SWT_LETTERS = os.environ.get("SWT_LETTERS", "")


def _letters_mode() -> str:
    if SWT_LETTERS in ("device", "compact", "host"):
        return SWT_LETTERS
    return "compact" if jax.default_backend() != "cpu" else "host"


def detect_words_async(a, params: Optional[SwtParams] = None):
    """Pipelined detection: submit an image, overlap device compute,
    tunnel transfers and the host letter stage across in-flight images.
    Returns a future; resolve with `detect_words_collect`."""
    global _EXECUTOR
    if _EXECUTOR is None:
        from concurrent.futures import ThreadPoolExecutor
        _EXECUTOR = ThreadPoolExecutor(max_workers=3)
    return _EXECUTOR.submit(detect_words, a, params)


def detect_words_collect(fut) -> List[Comp]:
    return fut.result()


def detect_words(a, params: Optional[SwtParams] = None,
                 timings: Optional[dict] = None) -> List[Comp]:
    """ccv_swt_detect_words twin (ccv_swt.c:625), single scale by default.

    Pass a dict as `timings` to collect a per-stage wall-clock breakdown
    (ms, accumulated over scales): frontend / rays / sync / fetch / cc /
    letters — the instrumentation VERDICT r2 asked for to localize the
    SWT budget between device programs, tunnel transfers and host math."""
    import time as _time

    def _mark(stage, t0):
        if timings is not None:
            t1 = _time.perf_counter()
            timings[stage] = timings.get(stage, 0.0) + (t1 - t0) * 1e3
            return t1
        return t0

    from ccv_tpu.core.dense_matrix import as_array

    params = params or SwtParams()
    img = as_array(a)
    if img.ndim == 3:
        img = img[..., 0]
    all_words: List[dict] = []
    scale = 2.0 ** (1.0 / (params.interval + 1.0))
    if params.scale_invariant:
        hr = img.shape[0] * 2 // (params.min_height + params.max_height)
        wr = img.shape[1] * 2 // (params.min_height + params.max_height)
        scale_upto = int(math.log(min(hr, wr)) / math.log(scale))
    else:
        scale_upto = 1
    next_ = params.interval + 1
    phx = img
    cscale = 1.0
    for k in range(scale_upto):
        if k % next_:
            j = k % next_
            pyr = resample.resample(
                phx, rows=int(phx.shape[0] / scale ** j),
                cols=int(phx.shape[1] / scale ** j),
                rows_scale=1 / scale ** j, cols_scale=1 / scale ** j,
                interp=resample.INTER_AREA)
        elif k > 0:
            phx = resample.sample_down(phx)
            pyr = phx
        else:
            pyr = phx
        h_, w_ = pyr.shape
        _t = __import__("time").perf_counter()
        # FAST PATH (steady state, "compact" letter mode with a hint):
        # frontend + rays + stroke compaction in one program, one fetch.
        # Any overflow in the header re-sizes and retries; persistent
        # disagreement falls through to the stepwise path below.
        hint0 = _COUNT_HINT.get((h_, w_))
        sm_np = gray_np = None
        if _letters_mode() == "compact" and hint0 is not None:
            cnt_h, maxhn_h, total_h, npaint_h = hint0
            for _fretry in range(3):
                n_rays = _bucket_for(cnt_h, h_ * w_)
                T = _t_bucket(maxhn_h)
                m_slots = _m_bucket(total_h, n_rays, T)
                Pc = _compact_strokes_pbucket(npaint_h)
                bundle = _swt_full(
                    pyr, n_rays, T, m_slots, Pc, params.size,
                    int(params.low_thresh + 0.5),
                    int(params.high_thresh + 0.5))
                arr = np.asarray(bundle)
                cnt, unresolved, max_hn, total, npaint = map(int, arr[:5])
                _COUNT_HINT[(h_, w_)] = (
                    cnt, max_hn if not unresolved else MAX_RAY, total,
                    npaint)
                lanes_ok = (cnt <= n_rays
                            or n_rays >= _ray_lanes(h_ * w_))
                slot_cap = min((T + 1) * 6 * n_rays, 24 * n_rays)
                slots_ok = (total <= m_slots or m_slots >= slot_cap)
                if (lanes_ok and slots_ok and not unresolved
                        and npaint <= Pc):
                    pk = arr[8:8 + Pc]
                    m = pk >= 0
                    cpos = (pk[m] >> 7).astype(np.int64)
                    sm_flat = np.zeros(2 * h_ * w_, np.uint8)
                    sm_flat[cpos] = (pk[m] & 127).astype(np.uint8)
                    sm_np = sm_flat.reshape(2, h_, w_)
                    gl = arr[8 + Pc:].view(np.uint8)[:Pc][m]
                    gray_flat = np.zeros(h_ * w_, np.uint8)
                    gray_flat[cpos % (h_ * w_)] = gl
                    gray_np = gray_flat.reshape(h_, w_)
                    break
                cnt_h, maxhn_h = cnt, (MAX_RAY if unresolved else max_hn)
                total_h, npaint_h = total, npaint
        if sm_np is not None:
            _t = _mark("rays", _t)
            ccs = [_cc_host(sm_np[d]) for d in range(2)]
            _t = _mark("cc", _t)
            textlines = []
            for d in range(2):  # DARK_TO_BRIGHT, BRIGHT_TO_DARK
                letters = _letters_from_components(
                    gray_np, sm_np[d], ccs[d], params)
                textlines += _merge_textline(letters, params)
            _finish_scale = True
        else:
            _finish_scale = False
        if _finish_scale:
            _t = _mark("letters", _t)
            textlines = _swt_group_textlines(textlines, params)
            words = (_break_words(textlines, params) if params.breakdown
                     else [{kk: t[kk] for kk in ("x", "y", "width",
                                                 "height")}
                           for t in textlines])
            if params.scale_invariant:
                for wd in words:
                    all_words.append(dict(
                        x=int(wd["x"] * cscale + 0.5),
                        y=int(wd["y"] * cscale + 0.5),
                        width=int(wd["width"] * cscale + 0.5),
                        height=int(wd["height"] * cscale + 0.5)))
                cscale *= scale
            else:
                all_words = words
            continue
        c_dev, dx_dev, dy_dev, cnt_dev, gray8 = _swt_frontend(
            pyr, params.size, int(params.low_thresh + 0.5),
            int(params.high_thresh + 0.5))
        if timings is not None:
            jax.block_until_ready(c_dev)
        _t = _mark("frontend", _t)
        # size the ray program from this shape's last image: lane count
        # from the edge count, ray cap T from the longest hit, path slots
        # from the live stroke cells. Overflows ride back in the stats and
        # trigger a bigger re-run; steady state is one right-sized program
        # and a single transfer.
        hint = _COUNT_HINT.get((h_, w_))
        if hint is None:
            n_rays = _bucket_for(int(cnt_dev), h_ * w_)
            T, m_slots = MAX_RAY, None
        else:
            n_rays = _bucket_for(hint[0], h_ * w_)
            T = _t_bucket(hint[1])
            m_slots = _m_bucket(hint[2], n_rays, T)
        for _retry in range(3):
            packed, stats_dev = _swt_rays_both(
                c_dev, dx_dev, dy_dev, n_rays, T=T, m_slots=m_slots,
                gray8=gray8)
            # start ALL device->host copies before blocking on any: each
            # sync fetch over the tunneled device costs a full RTT; issued
            # together they overlap into ~one. The plane buffer only
            # crosses on the host letter path — prefetching it on the
            # device-letter path would put 0.92 MB back on the link.
            bufs = ((cnt_dev, stats_dev, packed)
                    if _letters_mode() == "host"
                    else (cnt_dev, stats_dev))
            for buf in bufs:
                try:
                    buf.copy_to_host_async()
                except AttributeError:
                    pass
            if timings is not None:
                jax.block_until_ready(packed)
            _t = _mark("rays", _t)
            cnt = int(cnt_dev)
            stats = np.asarray(stats_dev)
            unresolved, max_hn, total, npaint = map(int, stats)
            _COUNT_HINT[(h_, w_)] = (cnt, max_hn if not unresolved
                                     else MAX_RAY, total, npaint)
            lanes_ok = cnt <= n_rays or n_rays >= _ray_lanes(h_ * w_)
            slot_cap = min((T + 1) * 6 * n_rays, 24 * n_rays)
            slots_ok = (m_slots is None or total <= m_slots
                        or m_slots >= slot_cap)  # worst case: strokes drop
            if lanes_ok and slots_ok and not unresolved:
                break
            n_rays = _bucket_for(cnt, h_ * w_)
            T = MAX_RAY if unresolved else T
            m_slots = _m_bucket(total, n_rays, T)
        _t = _mark("sync", _t)
        letters2 = None
        sm_np = gray_np = None
        mode = _letters_mode()
        if mode == "compact":
            # ship compacted stroke cells, keep the native host CC +
            # numpy letter stats (overflow -> full plane fetch)
            Pc = _compact_strokes_pbucket(npaint)
            if npaint <= Pc:
                pk_dev, g_dev = _compact_strokes(packed, Pc)
                pk = np.asarray(pk_dev)
                gl = np.asarray(g_dev)
                m = pk >= 0
                cpos = (pk[m] >> 7).astype(np.int64)
                sm_flat = np.zeros(2 * h_ * w_, np.uint8)
                sm_flat[cpos] = (pk[m] & 127).astype(np.uint8)
                sm_np = sm_flat.reshape(2, h_, w_)
                gray_flat = np.zeros(h_ * w_, np.uint8)
                gray_flat[cpos % (h_ * w_)] = gl[m]
                gray_np = gray_flat.reshape(h_, w_)
        elif mode == "device":
            # device letter stage: CC + per-component stats + filters run
            # on-chip; only (K, 13) letter rows cross the link (the
            # (3, H, W) plane fetch measured ~170 ms on the tunneled
            # device and dominated the whole detect). The P bucket comes
            # from the measured painted-cell count; overflow re-runs one
            # bucket up, table overflow falls back to the host plane path.
            P = _p_bucket(npaint)
            for _lretry in range(2):
                rows_dev, cnts_dev = _letters_device(
                    packed[:2].astype(jnp.int32), packed[2], P=P,
                    min_height=params.min_height,
                    max_height=params.max_height,
                    min_area=params.min_area,
                    aspect_ratio=params.aspect_ratio,
                    std_ratio=params.std_ratio)
                cnts_np = np.asarray(cnts_dev)
                if cnts_np[0] <= P or P >= _P_BUCKETS[-1]:
                    break
                P = _p_bucket(int(cnts_np[0]))
            if (cnts_np[0] <= P and cnts_np[1] <= _LETTER_CAP
                    and cnts_np[2] <= _KEPT_CAP):
                rows_np = np.asarray(rows_dev)
                letters2 = [[], []]
                for row in rows_np:
                    if row[0] == 0.0:
                        continue
                    if (params.letter_occlude_thresh
                            and row[10] > params.letter_occlude_thresh):
                        continue
                    letters2[int(row[1])].append(dict(
                        x=int(row[2]), y=int(row[3]),
                        width=int(row[4]), height=int(row[5]),
                        cx=int(row[11]), cy=int(row[12]),
                        thickness=int(row[6]), intensity=int(row[7]),
                        mean=float(row[8]), std=float(row[9])))
            # component/kept overflow: fall through to the host plane path
        _t = _mark("fetch", _t)
        if letters2 is not None:
            _t = _mark("cc", _t)
            textlines = []
            for d in range(2):
                textlines += _merge_textline(letters2[d], params)
        else:
            if sm_np is None:
                arr = np.asarray(packed)
                sm_np, gray_np = arr[:2], arr[2]
            _t = _mark("fetch", _t)
            ccs = [_cc_host(sm_np[d]) for d in range(2)]
            _t = _mark("cc", _t)
            textlines = []
            for d in range(2):  # DARK_TO_BRIGHT, BRIGHT_TO_DARK
                letters = _letters_from_components(
                    gray_np, sm_np[d], ccs[d], params)
                textlines += _merge_textline(letters, params)
        _t = _mark("letters", _t)
        textlines = _swt_group_textlines(textlines, params)
        words = _break_words(textlines, params) if params.breakdown else [
            {kk: t[kk] for kk in ("x", "y", "width", "height")} for t in textlines]
        if params.scale_invariant:
            for wd in words:
                all_words.append(dict(
                    x=int(wd["x"] * cscale + 0.5), y=int(wd["y"] * cscale + 0.5),
                    width=int(wd["width"] * cscale + 0.5),
                    height=int(wd["height"] * cscale + 0.5)))
            cscale *= scale
        else:
            all_words = words
    comps = [Comp(w["x"], w["y"], w["width"], w["height"]) for w in all_words]
    if params.scale_invariant and params.min_neighbors:
        idx = group(comps, lambda a, b: _same_textline(
            dict(x=a.x, y=a.y, width=a.width, height=a.height),
            dict(x=b.x, y=b.y, width=b.width, height=b.height),
            params.same_word_thresh))
        ngroups = max(idx) + 1 if comps else 0
        best = [None] * ngroups
        counts = [0] * ngroups
        for c_, g in zip(comps, idx):
            counts[g] += 1
            if best[g] is None or c_.width * c_.height > best[g].width * best[g].height:
                best[g] = c_
        comps = [dataclasses.replace(b, neighbors=n)
                 for b, n in zip(best, counts) if n >= params.min_neighbors]
    return comps
