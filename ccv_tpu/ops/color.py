"""Color-space ops (reference: lib/ccv_image_processing.c).

rgb_to_yuv uses the reference's /4096 fixed-point path for integer inputs
(C division truncates toward zero); saturation / contrast follow the
Rec.601 luma mix and per-channel-mean contrast stretch.
"""

from __future__ import annotations

import jax.numpy as jnp

from ccv_tpu.ops.filters import to_hwc, from_hwc

CCV_RGB_TO_YUV = 0x01


def _trunc_div(x, d):
    """C integer division: truncate toward zero."""
    return jnp.trunc(x / d)


def rgb_to_yuv(a):
    """ccv_color_transform(CCV_RGB_TO_YUV) twin (ccv_image_processing.c:4)."""
    is_int = jnp.issubdtype(a.dtype, jnp.integer)
    r = a[..., 0].astype(jnp.float32)
    g = a[..., 1].astype(jnp.float32)
    b = a[..., 2].astype(jnp.float32)
    if is_int:
        y = _trunc_div(r * 1225 + g * 2404 + b * 467, 4096)
        u = _trunc_div((b - y) * 2015, 4096) + 128
        v = _trunc_div((r - y) * 3592, 4096) + 128
        out = jnp.stack([y, u, v], axis=-1)
        out = jnp.clip(out, 0, 255).astype(a.dtype)
    else:
        y = (r * 1225 + g * 2404 + b * 467) / 4096
        u = (b - y) * 2015 / 4096 + 128
        v = (r - y) * 3592 / 4096 + 128
        out = jnp.stack([y, u, v], axis=-1).astype(a.dtype)
    return out


def color_transform(a, flag: int = CCV_RGB_TO_YUV):
    assert flag == CCV_RGB_TO_YUV
    return rgb_to_yuv(a)


def saturation(a, ds: float):
    """ccv_saturation twin: lerp each pixel against its Rec.601 luma."""
    is_int = jnp.issubdtype(a.dtype, jnp.integer)
    x = a.astype(jnp.float32)
    gs = x[..., 0] * 0.299 + x[..., 1] * 0.587 + x[..., 2] * 0.114
    out = (x - gs[..., None]) * jnp.float32(ds) + gs[..., None]
    if is_int:
        # C setter truncates toward zero and clamps (lib/ccv_internal.h:266)
        out = jnp.clip(jnp.trunc(out), 0, 255).astype(a.dtype)
    return out


def contrast(a, ds: float):
    """ccv_contrast twin: stretch around the per-channel mean."""
    a, had = to_hwc(a)
    is_int = jnp.issubdtype(a.dtype, jnp.integer)
    x = a.astype(jnp.float32)
    # the reference accumulates the mean in double over all pixels
    ms = jnp.mean(x.astype(jnp.float64) if False else x, axis=(-3, -2), keepdims=True)
    out = (x - ms) * jnp.float32(ds) + ms
    if is_int:
        out = jnp.clip(jnp.trunc(out), 0, 255).astype(a.dtype)
    return from_hwc(out, had)
