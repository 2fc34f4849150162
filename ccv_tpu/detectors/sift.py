"""SIFT keypoints + descriptors (reference: lib/ccv_sift.c, VLFeat-derived).

TPU-native redesign:
- Gaussian/DoG/gradient pyramids are stacked XLA ops per octave.
- 3x3x3 extrema detection + iterative quadratic refinement run for *every*
  pixel at once (the 5-step convergence loop is a vectorized fori_loop with
  per-candidate state instead of the reference's per-pixel loop,
  ccv_sift.c:286-316).
- Orientation histograms and 4x4x8 descriptors are vmapped fixed-window
  gathers with masked out-of-round pixels; the reference's fast_expn LUT
  (ccv_sift.c:141-160) is reproduced exactly for parity.
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
EXPN_SZ = 256
EXPN_MAX = 25.0
_EXPN_TAB = np.exp(-np.arange(EXPN_SZ + 1) * (EXPN_MAX / EXPN_SZ))


@dataclasses.dataclass
class SiftParams:
    """ccv_sift_default_params twin (ccv_sift.c:36)."""

    noctaves: int = 3
    nlevels: int = 6
    up2x: bool = True
    edge_threshold: float = 10.0
    norm_threshold: float = 0.0
    peak_threshold: float = 0.0


def _expn(x):
    """fast_expn LUT with linear interpolation (exact reference twin)."""
    x = jnp.clip(x, 0.0, EXPN_MAX)
    xs = x * (EXPN_SZ / EXPN_MAX)
    i = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, EXPN_SZ - 1)
    r = xs - i
    tab = jnp.asarray(_EXPN_TAB, jnp.float32)
    return tab[i] + r * (tab[i + 1] - tab[i])


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


@partial(jax.jit, static_argnames=("nlevels",))
def find_keypoints(dog, peak_threshold: float, edge_threshold: float,
                   nlevels: int):
    """Vectorized extrema + iterative subpixel refinement.

    dog: (L-1, H, W). Returns per-(level, y, x): valid mask, kp_x, kp_y,
    kp_scale (level units).
    """
    L1, H, W = dog.shape

    def neighbors_extrema(j):
        b, c, u = dog[j - 1], dog[j], dog[j + 1]
        v = c
        lt = (v <= -peak_threshold)
        gt = (v >= peak_threshold)
        for arr in (b, c, u):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    if arr is c and di == 0 and dj == 0:
                        continue
                    nb = jnp.roll(arr, (-di, -dj), (0, 1))
                    lt = lt & (v < nb)
                    gt = gt & (v > nb)
        ext = lt | gt
        # exclude the 1-pixel border
        ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        return ext & (ii >= 1) & (ii < H - 1) & (jj >= 1) & (jj < W - 1)

    def refine_level(j):
        ext = neighbors_extrema(j)
        b, c, u = dog[j - 1], dog[j], dog[j + 1]
        jj0 = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        ii0 = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)

        def n9(ix, iy):
            """gather the 3x3x3 neighborhood at integer (ix, iy)."""
            vals = []
            for arr in (b, c, u):
                for di in (-1, 0, 1):
                    row = []
                    for dj in (-1, 0, 1):
                        row.append(arr[(iy + di).clip(0, H - 1),
                                       (ix + dj).clip(0, W - 1)])
                    vals.append(jnp.stack(row, -1))
            return jnp.stack(vals, -2).reshape(*ix.shape, 3, 3, 3)  # (.., s, dy, dx)

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
            N = n9(ix, iy)
            bx, by, bs, sc = solve(N)
            nkx = ix + jnp.clip(bx, -1, 1)
            nky = iy + jnp.clip(by, -1, 1)
            nks = j + bs
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

        init = (jj0, ii0, ext, jj0.astype(jnp.float32), ii0.astype(jnp.float32),
                jnp.full((H, W), float(j), jnp.float32), jnp.full((H, W), -1.0))
        ix, iy, alive, kx, ky, ks, score = jax.lax.fori_loop(0, 5, body, init)
        final_val = c[iy.clip(0, H - 1), ix.clip(0, W - 1)]
        # re-gather |dog| at the final integer location (all levels share c=dog[j])
        et = (edge_threshold + 1.0) ** 2 / edge_threshold
        valid = (ext & (kx > -5)
                 & (jnp.abs(final_val) > peak_threshold)
                 & (score >= 0) & (score < et)
                 & (ks > 0) & (ks < nlevels - 1))
        return valid, kx, ky, ks

    results = [refine_level(j) for j in range(1, L1 - 1)]
    valid = jnp.stack([r[0] for r in results])
    kx = jnp.stack([r[1] for r in results])
    ky = jnp.stack([r[2] for r in results])
    ks = jnp.stack([r[3] for r in results])
    return valid, kx, ky, ks


@partial(jax.jit, static_argnames=("nlevels", "cap"))
def find_keypoints_compact(dog, peak_threshold: float, edge_threshold: float,
                           nlevels: int, cap: int):
    """find_keypoints + on-device compaction to `cap` lanes.

    Transferring the dense (L, H, W) planes to the host costs ~75 MB per
    octave — multiple seconds over a tunneled device link; the compacted
    form is a few KB. Returns (count, kxs, kys, kss, levels): `count` is
    the true keypoint total (host re-runs at a bigger cap on overflow,
    the SWT lane-rebucketing pattern)."""
    valid, kx, ky, ks = find_keypoints(dog, peak_threshold, edge_threshold,
                                       nlevels)
    L, H, W = valid.shape
    flat = valid.reshape(-1)
    count = flat.sum(dtype=jnp.int32)
    (idx,) = jnp.nonzero(flat, size=cap, fill_value=0)
    lane = jnp.arange(cap) < count
    kxs = jnp.where(lane, kx.reshape(-1)[idx], 0.0)
    kys = jnp.where(lane, ky.reshape(-1)[idx], 0.0)
    kss = jnp.where(lane, ks.reshape(-1)[idx], 1.0)
    levels = jnp.where(lane, (idx // (H * W)).astype(jnp.int32) + 1, 1)
    return count, kxs, kys, kss, levels


ORI_WIN = 16  # max orientation window radius: 3*1.5*scale(max~3.2)+.5 ~ 15


def _orientation_core(th, md, kxs, kys, scales, levels, valid):
    """Smoothed 36-bin orientation histograms for a batch of keypoints.

    th/md: (L-3, H, W) gradient pyramids of one octave; kxs/kys in octave
    coordinates; `valid` zeroes padded slots (count bucketing). Returns
    (N, 36) f32 bins.

    TPU redesign (round 3): the reference's per-pixel 2-tap scatter into
    the histogram (ccv_sift.c:352-366) is a circular tent kernel — each
    pixel's weight to bin b is max(0, 1 - circdist(fbin-0.5, b)).  So the
    whole histogram is one (1,P)x(P,36) matmul per keypoint, batched over
    keypoints on the MXU: no scatters, no serial adds.
    """
    Lg, H, W = th.shape

    def one(kx, ky, scale, level, vmask):
        ix = (kx + 0.5).astype(jnp.int32)
        iy = (ky + 0.5).astype(jnp.int32)
        sigmaw = 1.5 * scale
        wz = jnp.maximum((3.0 * sigmaw + 0.5).astype(jnp.int32), 1)
        dy = jnp.arange(-ORI_WIN, ORI_WIN + 1)
        dx = jnp.arange(-ORI_WIN, ORI_WIN + 1)
        yy = iy + dy[:, None]
        xx = ix + dx[None, :]
        inside = ((yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
                  & (jnp.abs(dy)[:, None] <= wz) & (jnp.abs(dx)[None, :] <= wz))
        t = th[level, yy.clip(0, H - 1), xx.clip(0, W - 1)]
        m = md[level, yy.clip(0, H - 1), xx.clip(0, W - 1)]
        r2 = (xx - kx) ** 2 + (yy - ky) ** 2
        inside &= r2 <= wz * wz + 0.6
        weight = _expn(r2 / (2.0 * sigmaw * sigmaw))
        mw = jnp.where(inside, m * weight, 0.0).reshape(-1) * vmask
        fbin = (t * 0.1 - 0.5).reshape(-1)  # tent center coordinate
        d = jnp.abs(fbin[:, None] - jnp.arange(36.0)[None, :])
        tri = jnp.maximum(0.0, 1.0 - jnp.minimum(d, 36.0 - d))  # (P, 36)
        bins = jnp.matmul(mw[None, :], tri,
                          preferred_element_type=jnp.float32)[0]

        def smooth(_, bins):
            prev = jnp.roll(bins, 1)
            nxt = jnp.roll(bins, -1)
            return (prev + bins + nxt) / 3.0

        return jax.lax.fori_loop(0, 6, smooth, bins)

    return jax.vmap(one)(kxs, kys, scales, levels, valid)


orientation_bins = jax.jit(_orientation_core)

DESC_WIN = 56  # max descriptor window radius: 3*scale*sqrt(2)*2.5+0.5
_DESC_CHUNK = 128  # keypoints per lax.map chunk (bounds A's HBM footprint)


def _descriptors_core(th, md, kxs, kys, scales, levels, angles, valid):
    """4x4x8 SIFT descriptors for a batch of keypoints (one octave).

    TPU redesign (round 3): the reference's trilinear scatter
    (ccv_sift.c:391-470) factorizes exactly — each pixel contributes
    weight(p) * tent_y(p,by) * tent_x(p,bx) * tent_t(p,bt), so

        desc[(by,bx), bt] = sum_p A[p, (by,bx)] * B[p, bt]

    with A = weight x spatial tents (P,16) and B = circular orientation
    tents (P,8).  One (16,P)x(P,8) matmul per keypoint, batched over a
    lax.map chunk of keypoints: pure MXU work, zero scatters (the previous
    form did 8 serial .at[].add scatters per keypoint and was 50x slower
    than the reference's single-core C loop).
    """
    Lg, H, W = th.shape
    centers = jnp.array([-1.5, -0.5, 0.5, 1.5], jnp.float32)

    def one(args):
        kx, ky, scale, level, angle, vmask = args
        ix = (kx + 0.5).astype(jnp.int32)
        iy = (ky + 0.5).astype(jnp.int32)
        SBP = 3.0 * scale
        wz = jnp.maximum((SBP * math.sqrt(2.0) * 2.5 + 0.5).astype(jnp.int32), 1)
        dy = jnp.arange(-DESC_WIN, DESC_WIN + 1)
        dx = jnp.arange(-DESC_WIN, DESC_WIN + 1)
        yy = iy + dy[:, None]
        xx = ix + dx[None, :]
        inside = ((yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
                  & (jnp.abs(dy)[:, None] <= wz) & (jnp.abs(dx)[None, :] <= wz))
        t = th[level, yy.clip(0, H - 1), xx.clip(0, W - 1)]
        m = md[level, yy.clip(0, H - 1), xx.clip(0, W - 1)]
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        fx = xx - kx
        fy = yy - ky
        nx = ((ca * fx + sa * fy) / SBP).reshape(-1)
        ny = ((-sa * fx + ca * fy) / SBP).reshape(-1)
        nt = (8.0 * jnp.mod(t * (math.pi / 180.0) - angle, 2.0 * math.pi)
              / (2.0 * math.pi)).reshape(-1)
        weight = (_expn((nx * nx + ny * ny) / (2.0 * 2.0 * 2.0))
                  * m.reshape(-1)
                  * jnp.where(inside.reshape(-1), vmask, 0.0))
        # spatial tents: bin bx gets |1-dbx-rbinx| = max(0, 1-|nx-(bx+.5)|)
        tx = jnp.maximum(0.0, 1.0 - jnp.abs(nx[:, None] - centers))  # (P,4)
        ty = jnp.maximum(0.0, 1.0 - jnp.abs(ny[:, None] - centers))  # (P,4)
        A = ((weight[:, None] * ty)[:, :, None] * tx[:, None, :]).reshape(-1, 16)
        # circular orientation tents over 8 bins (period 8)
        dtt = jnp.abs(nt[:, None] - jnp.arange(8.0)[None, :])
        B = jnp.maximum(0.0, 1.0 - jnp.minimum(dtt, 8.0 - dtt))  # (P,8)
        desc = jnp.matmul(A.T, B,
                          preferred_element_type=jnp.float32).reshape(128)
        # L2 normalize, clip at 0.2, renormalize (ccv_sift.c:455-470)
        norm = jnp.sqrt(jnp.sum(desc * desc))
        desc = desc / jnp.maximum(norm, 1e-12)
        desc = jnp.minimum(desc, 0.2)
        desc = desc / jnp.maximum(jnp.sqrt(jnp.sum(desc * desc)), 1e-12)
        return desc

    return jax.lax.map(one, (kxs, kys, scales, levels, angles, valid),
                       batch_size=_DESC_CHUNK)


descriptors = jax.jit(_descriptors_core)


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


@partial(jax.jit, static_argnames=("nlevels", "cap", "cap_e", "want_desc",
                                   "up2x_octave"))
def _octave_program(g0, peak_threshold: float, edge_threshold: float,
                    nlevels: int, cap: int, cap_e: int, want_desc: bool,
                    up2x_octave: bool):
    """The WHOLE per-octave pipeline as one device program: pyramid ->
    extrema+refine -> compact to `cap` keypoint lanes -> orientation
    histograms -> peak selection -> compact to `cap_e` (keypoint, angle)
    entries -> descriptors.

    One program, one small transfer: the previous staged form synced the
    dense (L, H, W) planes per stage — measured 12.9 s of a 13.7 s
    sift() call was device->host transfer over the tunneled link. Caps
    are bucketed from per-shape hints; the true counts ride back with the
    results, and the host re-runs an octave at bigger caps on overflow
    (the SWT lane-rebucketing pattern)."""
    sigmak = 2.0 ** (1.0 / (nlevels - 3))
    dog, th, md = _build_pyramids(g0, nlevels, up2x_octave)
    L, H, W = dog.shape

    valid, kx, ky, ks = find_keypoints(dog, peak_threshold, edge_threshold,
                                       nlevels)
    flat = valid.reshape(-1)
    count = flat.sum(dtype=jnp.int32)
    (idx,) = jnp.nonzero(flat, size=cap, fill_value=0)
    lane = jnp.arange(cap) < count
    kxs = jnp.where(lane, kx.reshape(-1)[idx], 0.0)
    kys = jnp.where(lane, ky.reshape(-1)[idx], 0.0)
    kss = jnp.where(lane, ks.reshape(-1)[idx], 1.0)
    levels = jnp.where(lane, (idx // (H * W)).astype(jnp.int32) + 1, 1)
    sigma = SIGMA0 * sigmak * jnp.power(2.0, kss / (nlevels - 3))
    vmask = lane.astype(jnp.float32)

    bins = _orientation_core(th, md, kxs, kys, sigma, levels - 1, vmask)

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
        out["desc"] = _descriptors_core(th, md, ekx, eky, esig, elvl - 1,
                                        eang, elane.astype(jnp.float32))
    return out


def _bucket(n: int) -> int:
    """Round a keypoint count up to a power of two (min 32) so repeated
    calls hit the jit compile cache (the SWT _BUCKETS pattern)."""
    b = 32
    while b < n:
        b *= 2
    return b


_CAP_HINT: dict = {}   # (H, W, octave) -> (count, entry count) last seen


def sift(a, params: Optional[SiftParams] = None, want_desc: bool = True):
    """ccv_sift twin (ccv_sift.c:172): returns (keypoints, descriptors).

    keypoints: list of dicts {x, y, octave, level, scale, angle} in input
    coordinates; descriptors: (N, 128) float32 numpy or None.

    Every octave runs as ONE fused device program (_octave_program); all
    octaves dispatch before a single batched device_get — in steady state
    one transfer and zero mid-pipeline syncs per image.
    """
    from ccv_tpu.core.dense_matrix import as_array

    params = params or SiftParams()
    img = as_array(a)
    if img.ndim == 3:
        img = img[..., 0]
    nlevels = params.nlevels

    # octave inputs: next octave = sample_down of the previous octave's
    # g[0]-equivalent (ccv_sift.c:233); -1 = the 2x upsampled octave
    chain = [img]
    for oi in range(1, params.noctaves):
        chain.append(resample.sample_down(chain[-1]))
    all_octaves = ([(-1, resample.sample_up(img))] if params.up2x else []) + [
        (i, chain[i]) for i in range(params.noctaves)]

    def dispatch(oct_i, g0, cap, cap_e):
        return _octave_program(
            g0, params.peak_threshold, params.edge_threshold, nlevels,
            cap, cap_e, want_desc, oct_i == -1)

    staged = []
    for oct_i, g0 in all_octaves:
        hkey = (int(g0.shape[0]), int(g0.shape[1]), oct_i)
        hint = _CAP_HINT.get(hkey)
        if hint is None:
            cap = _bucket((int(g0.shape[0]) * int(g0.shape[1])) // 1024)
            cap_e = 2 * cap
        else:
            cap, cap_e = _bucket(hint[0]), _bucket(max(hint[1], 32))
        staged.append((oct_i, g0, cap, cap_e,
                       dispatch(oct_i, g0, cap, cap_e)))

    results = jax.device_get([s[4] for s in staged])

    keypoints = []
    desc_rows = []
    for (oct_i, g0, cap, cap_e, _), r in zip(staged, results):
        n, ne = int(r["count"]), int(r["ecount"])
        hkey = (int(g0.shape[0]), int(g0.shape[1]), oct_i)
        _CAP_HINT[hkey] = (n, ne)
        # overflowed caps drop keypoints: re-run this octave bigger (the
        # entry count can only be trusted once the keypoint cap holds)
        tries = 0
        while (n > cap or ne > cap_e) and tries < 4:
            cap = _bucket(n)
            cap_e = _bucket(max(ne, 32))
            r = jax.device_get(dispatch(oct_i, g0, cap, cap_e))
            n, ne = int(r["count"]), int(r["ecount"])
            _CAP_HINT[hkey] = (n, ne)
            tries += 1
        if ne == 0:
            continue
        s = 2.0 ** oct_i
        ekx, eky = r["ekx"], r["eky"]
        esig, elvl, eang = r["esig"], r["elvl"], r["eang"]
        for i in range(ne):
            keypoints.append(dict(
                x=float(ekx[i] * s), y=float(eky[i] * s), octave=oct_i,
                level=int(elvl[i]), scale=float(esig[i]),
                angle=float(eang[i])))
        if want_desc:
            desc_rows.append(r["desc"][:ne])

    desc = np.concatenate(desc_rows, 0).astype(np.float32) if desc_rows else None
    return keypoints, desc


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
