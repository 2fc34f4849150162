"""Geometric transforms (reference: lib/ccv_transform.c).

decimal_slice: bilinear sub-pixel crop (used by TLD); 14-bit fixed point for
integer inputs. perspective_transform: FOV-60 3D warp with bilinear sampling,
zeros outside the source — expressed as a dense gather, batch-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ccv_tpu.ops.filters import to_hwc, from_hwc


def decimal_slice(a, y: float, x: float, rows: int, cols: int):
    """ccv_decimal_slice twin (lib/ccv_transform.c:4).

    Crops a rows x cols window at decimal offset (y, x) with bilinear
    interpolation; 8U path uses 14-bit fixed-point weights with truncating
    division. Out-of-bound regions are zero (reference's best-effort border).
    """
    a, had = to_hwc(a)
    H, W = a.shape[-3], a.shape[-2]
    is_int = jnp.issubdtype(a.dtype, jnp.integer)
    iy, ix = int(y), int(x)
    yd, xd = y - iy, x - ix
    w00 = (1 - xd) * (1 - yd)
    w01 = xd * (1 - yd)
    w10 = (1 - xd) * yd
    w11 = xd * yd
    if is_int:
        W_BITS14 = 14
        iw00 = int(w00 * (1 << W_BITS14) + 0.5)
        iw01 = int(w01 * (1 << W_BITS14) + 0.5)
        iw10 = int(w10 * (1 << W_BITS14) + 0.5)
        iw11 = (1 << W_BITS14) - iw00 - iw01 - iw10
        weights, den = (iw00, iw01, iw10, iw11), float(1 << W_BITS14)
    else:
        weights, den = (w00, w01, w10, w11), 1.0

    ys = jnp.clip(jnp.arange(rows) + iy, 0, H - 1)
    xs = jnp.clip(jnp.arange(cols) + ix, 0, W - 1)
    ys1 = jnp.clip(ys + 1, 0, H - 1)
    xs1 = jnp.clip(xs + 1, 0, W - 1)
    af = a.astype(jnp.float32)

    def gather(yi, xi):
        return af[..., yi, :, :][..., :, xi, :]

    out = (
        gather(ys, xs) * weights[0]
        + gather(ys, xs1) * weights[1]
        + gather(ys1, xs) * weights[2]
        + gather(ys1, xs1) * weights[3]
    )
    out = jnp.trunc(out / den) if is_int else out / den
    # zero the strictly out-of-bounds region (reference zeroes db first)
    row_ok = ((jnp.arange(rows) + iy) >= 0) & ((jnp.arange(rows) + iy) <= H - 1)
    col_ok = ((jnp.arange(cols) + ix) >= 0) & ((jnp.arange(cols) + ix) <= W - 1)
    mask = row_ok[:, None] & col_ok[None, :]
    out = jnp.where(mask[..., None], out, 0)
    if is_int:
        out = jnp.clip(out, 0, 255).astype(a.dtype) if a.dtype == jnp.uint8 else out.astype(a.dtype)
    else:
        out = out.astype(a.dtype)
    return from_hwc(out, had)


def perspective_transform(a, m00, m01, m02, m10, m11, m12, m20, m21, m22):
    """ccv_perspective_transform twin (lib/ccv_transform.c:120).

    The matrix is pre-scaled by 1/max(rows, cols) (FOV-60 convention); output
    pixel (i, j) bilinearly samples the source at the warped position, zero
    outside. Dense vectorized gather over the full image.
    """
    a, had = to_hwc(a)
    H, W = a.shape[-3], a.shape[-2]
    s = 1.0 / max(H, W)
    m00, m01, m02 = m00 * s, m01 * s, m02 * s
    m10, m11, m12 = m10 * s, m11 * s, m12 * s
    m20, m21 = m20 * s * s, m21 * s * s
    m22 = m22 * s

    cy = jnp.arange(H, dtype=jnp.float32) - H * 0.5
    cx = jnp.arange(W, dtype=jnp.float32) - W * 0.5
    cyg, cxg = jnp.meshgrid(cy, cx, indexing="ij")
    wz = 1.0 / (cxg * m20 + cyg * m21 + m22)
    wx = W * 0.5 + (cxg * m00 + cyg * m01 + m02) * wz
    wy = H * 0.5 + (cxg * m10 + cyg * m11 + m12) * wz
    iwx = jnp.trunc(wx).astype(jnp.int32)  # C (int) cast truncates
    iwy = jnp.trunc(wy).astype(jnp.int32)
    fx = wx - iwx
    fy = wy - iwy
    valid = (iwx >= 0) & (iwx < W) & (iwy >= 0) & (iwy < H)
    iwx0 = jnp.clip(iwx, 0, W - 1)
    iwy0 = jnp.clip(iwy, 0, H - 1)
    iwx1 = jnp.minimum(iwx + 1, W - 1)
    iwy1 = jnp.minimum(iwy + 1, H - 1)
    af = a.astype(jnp.float32)

    def gather(yi, xi):
        return af[..., yi.reshape(-1), xi.reshape(-1), :].reshape(*af.shape[:-3], H, W, af.shape[-1])

    out = (
        gather(iwy0, iwx0) * ((1 - fx) * (1 - fy))[..., None]
        + gather(iwy0, iwx1) * (fx * (1 - fy))[..., None]
        + gather(iwy1, iwx0) * ((1 - fx) * fy)[..., None]
        + gather(iwy1, iwx1) * (fx * fy)[..., None]
    )
    out = jnp.where(valid[..., None], out, 0)
    if jnp.issubdtype(a.dtype, jnp.integer):
        out = jnp.clip(jnp.trunc(out), 0, 255 if a.dtype == jnp.uint8 else None)
    out = out.astype(a.dtype)
    return from_hwc(out, had)
