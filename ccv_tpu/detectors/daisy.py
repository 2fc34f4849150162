"""DAISY dense descriptor (reference: lib/ccv_daisy.c, Tola et al.).

Pipeline: oriented gradient layers max(0, cos t * dx + sin t * dy) -> initial
Gaussian smoothing -> per-ring incremental smoothing at cube sigmas ->
descriptor = center histogram + bilinear petal samples on rad_q_no rings of
th_q_no points -> one of three normalizations. All layers/rings are batched
XLA ops; the petal sampling is a fixed bilinear gather over the whole image.

Note: the reference transposes rings into (pixel, hist) layout in place and
its outermost ring reads a cube that skipped that transpose
(ccv_daisy.c:108-131); we implement the intended semantics (every ring reads
its own smoothed cube), so outermost-ring values differ from the reference's
quirk.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.ops import basic

NORMAL_PARTIAL = 0x01
NORMAL_FULL = 0x02
NORMAL_SIFT = 0x03


@dataclasses.dataclass
class DaisyParams:
    radius: float = 15.0
    rad_q_no: int = 3
    th_q_no: int = 8
    hist_th_q_no: int = 8
    normalize_threshold: float = 0.154
    normalize_method: int = NORMAL_PARTIAL


def daisy(a, params: DaisyParams = DaisyParams()):
    """ccv_daisy twin: returns (H, W, grid_points * hist) float32."""
    from ccv_tpu.core.dense_matrix import as_array

    img = as_array(a)
    if img.ndim == 3:
        img = img[..., 0]
    H, W = img.shape
    P = params
    grid_point_number = P.rad_q_no * P.th_q_no + 1
    r_step = P.radius / P.rad_q_no
    cube_sigmas = [(i + 1) * r_step * 0.5 for i in range(P.rad_q_no)]
    t_step = 2 * math.pi / P.th_q_no
    # oriented gradient layers (the 3-tap sobel provides sigma ~ 0.85 blur)
    dx = basic.sobel(img, 1, 0, out_float=True)
    dy = basic.sobel(img, 0, 1, out_float=True)
    sobel_sigma = math.sqrt(0.5 / -math.log(0.5))
    sigma_init = 1.6
    sigma0 = math.sqrt(sigma_init ** 2 - sobel_sigma ** 2)
    layers = []
    for k in range(P.hist_th_q_no):
        ang = k * 2 * math.pi / P.th_q_no
        g = jnp.maximum(0.0, math.cos(ang) * dx + math.sin(ang) * dy)
        layers.append(basic.blur(g, sigma0))
    cube = jnp.stack(layers, axis=-1)  # (H, W, hist)
    cubes = []
    prev_sigma = 0.0
    cur = cube
    for k in range(P.rad_q_no):
        s = cube_sigmas[k]
        inc = math.sqrt(s * s - prev_sigma * prev_sigma) if prev_sigma else s
        cur = basic.blur(cur, inc)
        cubes.append(cur)
        prev_sigma = s

    desc = jnp.zeros((H, W, grid_point_number, P.hist_th_q_no))
    desc = desc.at[:, :, 0, :].set(cube)

    yy = jnp.arange(H, dtype=jnp.float32)
    xx = jnp.arange(W, dtype=jnp.float32)
    yg, xg = jnp.meshgrid(yy, xx, indexing="ij")
    for r in range(P.rad_q_no):
        src = cubes[r]
        for j in range(P.th_q_no):
            t = r * P.th_q_no + 1 + j
            oy = math.sin(j * t_step) * (r + 1) * r_step
            ox = math.cos(j * t_step) * (r + 1) * r_step
            y = yg + oy
            x = xg + ox
            iy = jnp.round(y).astype(jnp.int32)
            ix = jnp.round(x).astype(jnp.int32)
            valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
            jy = jnp.floor(y).astype(jnp.int32)
            jx = jnp.floor(x).astype(jnp.int32)
            yr = y - jy
            xr = x - jx
            acc = jnp.zeros((H, W, P.hist_th_q_no))
            for dyy, dxx, wgt in ((0, 0, (1 - yr) * (1 - xr)),
                                  (1, 0, yr * (1 - xr)),
                                  (0, 1, (1 - yr) * xr),
                                  (1, 1, yr * xr)):
                sy = jy + dyy
                sx = jx + dxx
                ok = (sy >= 0) & (sy < H) & (sx >= 0) & (sx < W)
                vals = src[sy.clip(0, H - 1), sx.clip(0, W - 1)]
                acc = acc + jnp.where(ok[..., None], vals * wgt[..., None], 0.0)
            desc = desc.at[:, :, t, :].set(
                jnp.where(valid[..., None], acc, 0.0))

    flat = desc.reshape(H, W, grid_point_number * P.hist_th_q_no)
    if P.normalize_method == NORMAL_PARTIAL:
        norms = jnp.sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True))
        desc = jnp.where(norms > 1e-3, desc / jnp.maximum(norms, 1e-12), desc)
        return desc.reshape(H, W, -1).astype(jnp.float32)
    if P.normalize_method == NORMAL_FULL:
        norms = jnp.sqrt(jnp.sum(flat * flat, axis=-1, keepdims=True))
        return jnp.where(norms > 1e-3, flat / jnp.maximum(norms, 1e-12),
                         flat).astype(jnp.float32)
    # NORMAL_SIFT: iterate normalize + clamp at threshold
    out = flat
    for _ in range(5):
        norms = jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True))
        out = jnp.where(norms > 1e-3, out / jnp.maximum(norms, 1e-12), out)
        out = jnp.maximum(out, P.normalize_threshold)
    return out.astype(jnp.float32)
