"""Classic CV primitives (reference: lib/ccv_classic.c).

canny: the reference's integer path (sobel -> |dx|+|dy| -> direction-binned
NMS -> hysteresis BFS). The reference thins *seeds* with a sequential
suppress flag, but every suppressed strong pixel is 8-adjacent to an emitted
seed, so the post-hysteresis edge map is identical to plain hysteresis from
all strong NMS survivors — which is what we compute, as a vectorized
label-propagation fixpoint (`lax.while_loop` over 3x3 dilations).

otsu / close_outline are direct vectorizations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.ops import basic


_TG22 = int(0.4142135623730950488016887242097 * (1 << 15) + 0.5)


def canny_nms(dx: jax.Array, dy: jax.Array, low: int):
    """Direction-binned non-maximum suppression on f = |dx|+|dy| (int32).

    Returns (f, keep_mask) where keep marks NMS survivors with f > low.
    Comparisons replicate lib/ccv_classic.c:245-295 exactly (strict vs
    non-strict per direction); out-of-image neighbors compare as 0.
    """
    f = jnp.abs(dx) + jnp.abs(dy)
    H, W = f.shape
    fp = jnp.pad(f, 1)  # zero-pad == reference's zeroed boundary rows

    def nb(di, dj):
        return jax.lax.dynamic_slice(fp, (1 + di, 1 + dj), (H, W))

    x = jnp.abs(dx)
    y = jnp.abs(dy) << 15
    tg22x = x * _TG22
    tg67x = tg22x + ((x + x) << 15)
    s = jnp.where((dx ^ dy) < 0, -1, 1)

    horiz = y < tg22x
    vert = y > tg67x
    keep_h = (f > nb(0, -1)) & (f >= nb(0, 1))
    keep_v = (f > nb(-1, 0)) & (f >= nb(1, 0))
    # diagonal: f > rows[0][j-s] && f > rows[2][j+s] (both strict)
    keep_d_pos = (f > nb(-1, -1)) & (f > nb(1, 1))   # s = 1
    keep_d_neg = (f > nb(-1, 1)) & (f > nb(1, -1))   # s = -1
    keep_d = jnp.where(s > 0, keep_d_pos, keep_d_neg)
    keep = jnp.where(horiz, keep_h, jnp.where(vert, keep_v, keep_d))
    return f, keep & (f > low)


def _hysteresis(strong: jax.Array, weak: jax.Array):
    """Propagate strong labels through 8-connected weak pixels to fixpoint."""

    def dilate8(m):
        mp = jnp.pad(m, 1)
        out = m
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                out = out | jax.lax.dynamic_slice(
                    mp, (1 + di, 1 + dj), m.shape)
        return out

    def cond(state):
        cur, changed = state
        return changed

    def body(state):
        cur, _ = state
        nxt = (dilate8(cur) & weak) | cur
        return nxt, jnp.any(nxt != cur)

    out, _ = jax.lax.while_loop(cond, body, (strong, jnp.bool_(True)))
    return out


def canny(a, size: int = 3, low_thresh: float = 36, high_thresh: float = 36 * 3):
    """ccv_canny twin (lib/ccv_classic.c:196). Returns uint8 0/1 edge map."""
    assert a.ndim == 2, "canny expects a single-channel image"
    low = int(low_thresh + 0.5)
    high = int(high_thresh + 0.5)
    dx = basic.sobel(a, size, 0)
    dy = basic.sobel(a, 0, size)
    f, keep = canny_nms(dx.astype(jnp.int32), dy.astype(jnp.int32), low)
    strong = keep & (f > high)
    weak = keep
    edges = _hysteresis(strong, weak)
    return edges.astype(jnp.uint8)


def close_outline(a):
    """ccv_close_outline twin (lib/ccv_classic.c:345).

    Fills the 4-connected gaps of diagonally-adjacent edge pixels: wherever
    a[i,j] and a[i+1,j+1] are both set, the anti-diagonal pair is set to 1
    (and vice versa); untouched cells keep their input value.
    """
    nz = a != 0
    H, W = a.shape[-2], a.shape[-1]
    dr = jnp.zeros_like(nz)
    # rule 1: a[i,j] && a[i+1,j+1] -> set (i+1,j) and (i,j+1)
    r1 = nz[..., :-1, :-1] & nz[..., 1:, 1:]
    # rule 2: a[i+1,j] && a[i,j+1]  -> set (i,j) and (i+1,j+1)
    r2 = nz[..., 1:, :-1] & nz[..., :-1, 1:]
    dr = dr.at[..., 1:, :-1].max(r1)
    dr = dr.at[..., :-1, 1:].max(r1)
    dr = dr.at[..., :-1, :-1].max(r2)
    dr = dr.at[..., 1:, 1:].max(r2)
    return jnp.where(dr, jnp.ones_like(a), a)


def otsu(a, range_: int = 256):
    """ccv_otsu twin: returns (threshold, between-class variance).

    Vectorized closed form: cumulative histogram moments; first-maximum
    tie-breaking matches the reference's strict `>` update.
    """
    flat = jnp.clip(a.reshape(-1).astype(jnp.int32), 0, range_ - 1)
    hist = jnp.bincount(flat, length=range_)
    total = flat.size
    i = jnp.arange(range_, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    sum_all = jnp.sum(i * hist)
    wB = jnp.cumsum(hist)
    sumB = jnp.cumsum(i * hist)
    wF = total - wB
    valid = (wB > 0) & (wF > 0)
    mB = sumB / jnp.maximum(wB, 1)
    mF = (sum_all - sumB) / jnp.maximum(wF, 1)
    var = jnp.where(valid, wB * wF * (mB - mF) ** 2, 0.0)
    threshold = jnp.argmax(var)  # first occurrence on ties
    maxvar = var[threshold] / total / total
    return threshold, maxvar


# ---------------------------------------------------------------------------
# HOG (Felzenszwalb / UoCTTI 31-channel variant)
# ---------------------------------------------------------------------------

def _tri_downsample(x, size: int):
    """Bilinear (triangular-kernel) spatial binning: pixel i contributes to
    cell c with weight max(0, 1 - |(i+0.5)/size - 0.5 - c|); the reference
    does this with 4 scatter-adds per pixel (ccv_classic.c:66-95), here it
    is a depthwise strided correlation with a fixed triangular kernel —
    XLA maps it onto the conv unit instead of serial scatters.

    x: (H, W, C) with H, W multiples of `size`; returns (H//size, W//size, C).
    """
    pad_lo = size // 2
    L = 2 * size
    t = jnp.arange(L, dtype=jnp.float32)
    k = jnp.maximum(0.0, 1.0 - jnp.abs((t - pad_lo + 0.5) / size - 0.5))
    C = x.shape[-1]
    nchw = x.astype(jnp.float32).transpose(2, 0, 1)[None]  # (1, C, H, W)

    def dw(v, kern, axis):  # depthwise 1-d strided correlation
        shape = (1, 1, L, 1) if axis == 2 else (1, 1, 1, L)
        strides = (size, 1) if axis == 2 else (1, size)
        pads = [(pad_lo, size - pad_lo), (0, 0)] if axis == 2 else \
               [(0, 0), (pad_lo, size - pad_lo)]
        kern = jnp.broadcast_to(kern.reshape(shape), (C, 1) + shape[2:])
        return jax.lax.conv_general_dilated(
            v, kern, window_strides=strides, padding=pads,
            feature_group_count=C,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    out = dw(dw(nchw, k, 2), k, 3)
    return out[0].transpose(1, 2, 0)


def hog(a, sbin: int = 9, size: int = 8):
    """ccv_hog twin (lib/ccv_classic.c:4): Felzenszwalb 31-channel HOG.

    Returns (rows, cols, 4 + 3*sbin) float32 where rows=H//size,
    cols=W//size. Channel layout matches the reference: [4 texture-energy
    features, sbin contrast-insensitive, 2*sbin contrast-sensitive].

    Redesign: orientation binning becomes a one-hot weighted map; the
    4-way bilinear scatter becomes a strided triangular conv
    (`_tri_downsample`); the unrolled border TNA variants collapse to
    edge-clamped 2x2 neighborhood sums.
    """
    if a.ndim == 2:
        a = a[..., None]
    rows, cols = a.shape[0] // size, a.shape[1] // size
    theta, mag = basic.gradient(a, 1, 1)  # (H, W, ch) degrees / magnitude
    theta = theta[: rows * size, : cols * size]
    mag = mag[: rows * size, : cols * size]
    # strongest channel per pixel (strict-greater update keeps the first max)
    best = jnp.argmax(mag, axis=-1)
    agv = jnp.take_along_axis(theta, best[..., None], axis=-1)[..., 0]
    mgv = jnp.take_along_axis(mag, best[..., None], axis=-1)[..., 0] / 255.0
    nb = 2 * sbin
    agr = (jnp.clip(agv, 0.0, 359.99) / 360.0) * nb
    ag0 = jnp.floor(agr).astype(jnp.int32)
    ag1 = jnp.where(ag0 + 1 < nb, ag0 + 1, 0)
    fr = agr - ag0
    wmap = (jax.nn.one_hot(ag0, nb, dtype=jnp.float32) * ((1.0 - fr) * mgv)[..., None]
            + jax.nn.one_hot(ag1, nb, dtype=jnp.float32) * (fr * mgv)[..., None])
    cn = _tri_downsample(wmap, size)  # (rows, cols, 2*sbin)
    # per-cell gradient energy over contrast-insensitive sums
    ci = cn[..., :sbin] + cn[..., sbin:]
    ca = jnp.sum(ci * ci, axis=-1)  # (rows, cols)
    # 4 normalization factors: 2x2 neighborhood sums with edge clamping
    cap = jnp.pad(ca, 1, mode="edge")

    def s(di, dj):
        return jax.lax.dynamic_slice(cap, (1 + di, 1 + dj), ca.shape)

    n_dr = ca + s(0, 1) + s(1, 0) + s(1, 1)      # down-right
    n_ur = ca + s(0, 1) + s(-1, 0) + s(-1, 1)    # up-right
    n_dl = ca + s(0, -1) + s(1, 0) + s(1, -1)    # down-left
    n_ul = ca + s(0, -1) + s(-1, 0) + s(-1, -1)  # up-left
    norm = jax.lax.rsqrt(jnp.stack([n_dr, n_ur, n_dl, n_ul], axis=-1) + 1e-4)
    # (rows, cols, 4, 2*sbin) truncated-normalized contributions
    v = 0.5 * jnp.minimum(cn[..., None, :] * norm[..., None], 0.2)
    sensitive = jnp.sum(v, axis=2)                       # (rows, cols, 2*sbin)
    texture = 0.2357 * jnp.sum(v, axis=3)                # (rows, cols, 4)
    vi = 0.5 * jnp.minimum(ci[..., None, :] * norm[..., None], 0.2)
    insensitive = jnp.sum(vi, axis=2)                    # (rows, cols, sbin)
    return jnp.concatenate([texture, insensitive, sensitive], axis=-1)


# ---------------------------------------------------------------------------
# pyramidal Lucas-Kanade optical flow
# ---------------------------------------------------------------------------

_LK_MAX_ITER = 30
_LK_EPSILON = 0.01
_W_BITS14 = 14  # the reference's fixed-point scales, emulated in float so
_W_BITS7 = 7    # thresholds (min_eigen, LK_EPSILON) keep identical meaning
_W_BITS9 = 9
_FLT_SCALE = 1.0 / (1 << 25)


def _lk_window(img, iy, ix, w00, w01, w10, w11, wh: int, ww: int, scale):
    """Bilinearly-interpolated (wh, ww) window at integer corner (iy, ix)."""
    win = jax.lax.dynamic_slice(img, (iy, ix), (wh + 1, ww + 1))
    win = win.astype(jnp.float32)
    out = (w00 * win[:-1, :-1] + w01 * win[:-1, 1:]
           + w10 * win[1:, :-1] + w11 * win[1:, 1:])
    return out * scale


def _lk_level(a, adx, ady, b, prev_pts, next_pts, wh: int, ww: int,
              min_eigen: float, is_top: bool):
    """One pyramid level of LK for ALL points at once (vmapped).

    Returns (next_points, tracked_mask). The reference's per-point scalar
    loop (ccv_classic.c:482-608) becomes a vmap over points; the Newton
    iterations run as a fixed-trip fori_loop with per-point active masks
    (no divergence on TPU).

    Note: the reference computes widy with a `+ iw10` where the bilinear
    interpolation calls for `* iw10` (ccv_classic.c:536) — an upstream
    typo; we implement the correct bilinear weighting, so results can
    deviate slightly on sub-pixel y-gradients.
    """
    H, W = a.shape
    half_x, half_y = (ww - 1) * 0.5, (wh - 1) * 0.5
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    adxf = adx.astype(jnp.float32)
    adyf = ady.astype(jnp.float32)

    def one_point(prev, nxt):
        px = prev[0] - half_x
        py = prev[1] - half_y
        ipx = jnp.floor(px).astype(jnp.int32)
        ipy = jnp.floor(py).astype(jnp.int32)
        in_bounds = ((ipx >= 0) & (ipx < W - ww - 1)
                     & (ipy >= 0) & (ipy < H - wh - 1))
        xd = px - ipx
        yd = py - ipy
        w00 = (1 - xd) * (1 - yd)
        w01 = xd * (1 - yd)
        w10 = (1 - xd) * yd
        w11 = xd * yd
        ipyc = jnp.clip(ipy, 0, H - wh - 1)
        ipxc = jnp.clip(ipx, 0, W - ww - 1)
        s7 = float(1 << _W_BITS7)
        s5 = float(1 << (_W_BITS14 - _W_BITS9))
        wi = _lk_window(af, ipyc, ipxc, w00, w01, w10, w11, wh, ww, s7)
        widx = _lk_window(adxf, ipyc, ipxc, w00, w01, w10, w11, wh, ww, s5)
        widy = _lk_window(adyf, ipyc, ipxc, w00, w01, w10, w11, wh, ww, s5)
        a11 = jnp.sum(widx * widx) * _FLT_SCALE
        a12 = jnp.sum(widx * widy) * _FLT_SCALE
        a22 = jnp.sum(widy * widy) * _FLT_SCALE
        D = a11 * a22 - a12 * a12
        eigen = (a22 + a11 - jnp.sqrt((a11 - a22) ** 2 + 4.0 * a12 * a12)) \
            / (2.0 * ww * wh)
        good = in_bounds & (eigen >= min_eigen) & (D >= 1.1920929e-07)
        Dinv = jnp.where(good, 1.0 / jnp.maximum(D, 1e-30), 0.0)

        nx0 = nxt[0] - half_x
        ny0 = nxt[1] - half_y

        def body(j, st):
            nx, ny, pdx, pdy, active = st
            inx = jnp.floor(nx).astype(jnp.int32)
            iny = jnp.floor(ny).astype(jnp.int32)
            ib = ((inx >= 0) & (inx < W - ww - 1)
                  & (iny >= 0) & (iny < H - wh - 1))
            active = active & ib
            bxd = nx - inx
            byd = ny - iny
            b00 = (1 - bxd) * (1 - byd)
            b01 = bxd * (1 - byd)
            b10 = (1 - bxd) * byd
            b11 = bxd * byd
            inyc = jnp.clip(iny, 0, H - wh - 1)
            inxc = jnp.clip(inx, 0, W - ww - 1)
            bwin = _lk_window(bf, inyc, inxc, b00, b01, b10, b11, wh, ww, s7)
            diff = bwin - wi
            b1 = jnp.sum(diff * widx) * _FLT_SCALE
            b2 = jnp.sum(diff * widy) * _FLT_SCALE
            dx = (a12 * b2 - a22 * b1) * Dinv
            dy = (a12 * b1 - a11 * b2) * Dinv
            nx = jnp.where(active, nx + dx, nx)
            ny = jnp.where(active, ny + dy, ny)
            converged = dx * dx + dy * dy < _LK_EPSILON
            osc = (j > 0) & (jnp.abs(pdx - dx) < 0.01) & (jnp.abs(pdy - dy) < 0.01)
            # oscillation: settle halfway between the last two iterates
            nx = jnp.where(active & osc & ~converged, nx - dx * 0.5, nx)
            ny = jnp.where(active & osc & ~converged, ny - dy * 0.5, ny)
            active = active & ~converged & ~osc
            return nx, ny, dx, dy, active

        nx, ny, _, _, _ = jax.lax.fori_loop(
            0, _LK_MAX_ITER, body,
            (nx0, ny0, jnp.float32(0), jnp.float32(0), good))
        inx = jnp.floor(nx).astype(jnp.int32)
        iny = jnp.floor(ny).astype(jnp.int32)
        final_ib = ((inx >= 0) & (inx < W - ww - 1)
                    & (iny >= 0) & (iny < H - wh - 1))
        out_x = jnp.where(good & final_ib, nx + half_x, nxt[0])
        out_y = jnp.where(good & final_ib, ny + half_y, nxt[1])
        return jnp.stack([out_x, out_y]), good & final_ib

    return jax.vmap(one_point)(prev_pts, next_pts)


def optical_flow_lucas_kanade(a, b, points, win_size=(15, 15), level: int = 3,
                              min_eigen: float = 0.025):
    """ccv_optical_flow_lucas_kanade twin (lib/ccv_classic.c:437).

    a, b: uint8 single-channel frames; points: (N, 2) float32 (x, y).
    Returns (points_b (N, 2) float32, status (N,) bool).
    """
    import math as _math

    from ccv_tpu.ops import resample

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim == 3:
        a = a[..., 0]
    if b.ndim == 3:
        b = b[..., 0]
    H, W = a.shape
    ww, wh = int(win_size[0]), int(win_size[1])
    max_level = int(_math.log(min(H, W) / max(ww * 2, wh * 2)) / _math.log(2.0)
                    + 0.5)
    level = int(np.clip(level + 1, 1, max(1, max_level)))
    pts = jnp.asarray(points, jnp.float32).reshape(-1, 2)

    pyr_a, pyr_b = [a], [b]
    for _ in range(1, level):
        pyr_a.append(resample.sample_down(pyr_a[-1][..., None])[..., 0])
        pyr_b.append(resample.sample_down(pyr_b[-1][..., None])[..., 0])
    nxt = None
    status = jnp.ones((pts.shape[0],), bool)
    prev_shape = None
    for t in range(level - 1, -1, -1):
        at = pyr_a[t]
        bt = pyr_b[t]
        adx = basic.sobel(at, 3, 0).astype(jnp.int32)
        ady = basic.sobel(at, 0, 3).astype(jnp.int32)
        prev = pts / float(1 << t)
        if nxt is None:
            nxt = prev
        else:
            off_x = (at.shape[1] - prev_shape[1] * 2) * 0.5
            off_y = (at.shape[0] - prev_shape[0] * 2) * 0.5
            nxt = nxt * 2.0 + jnp.array([off_x, off_y], jnp.float32)
        nxt, tracked = _lk_level(at, adx, ady, bt, prev, nxt,
                                 wh, ww, float(min_eigen), t == level - 1)
        if t == 0:
            status = tracked
        prev_shape = at.shape
    return np.asarray(nxt), np.asarray(status)
