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
