"""Resampling (reference: lib/ccv_resample.c).

TPU-native redesign: area and cubic interpolation are *separable linear maps*,
so each becomes two dense matmuls on the MXU — ``out = Wy @ img @ Wx^T`` — with
the (static-shape) weight matrices precomputed on the host from the exact
reference coefficient rules:

- area  (_ccv_resample_area, lib/ccv_resample.c:135): interval-overlap weights
  with the reference's residue scale-up at the bottom/right boundary; the 8U
  fast path's /256 quantized alphas are reproduced for fidelity.
- cubic (_ccv_init_cubic_coeffs, lib/ccv_resample.c:280): A=-0.75 Catmull-Rom
  style taps at (i+0.5)*scale-0.5, clamped indices; the integer path's x64
  quantization + descale-by-12 is emulated.

sample_down / sample_up (lib/ccv_resample.c:480/:559) are the exact-2x 5-tap
[1,4,6,4,1] pyramid ops with symmetric borders, in integer arithmetic for
integer inputs (bit-exact vs the reference, including the /256 and /1024
truncating divisions).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.ops.filters import to_hwc, from_hwc

INTER_AREA = 0x01
INTER_LINEAR = 0x02
INTER_CUBIC = 0x04
INTER_LANCZOS = 0x08


# ---------------------------------------------------------------------------
# weight-matrix builders (host / numpy, static shapes)
# ---------------------------------------------------------------------------

def area_weights(n_out: int, n_in: int, scale: float, quantize: bool,
                 axis: str = "x", normalize: bool = True) -> np.ndarray:
    """(n_out, n_in) interval-overlap weights for one axis.

    Follows the reference's alpha rules (lib/ccv_resample.c:160-186): partial
    cells at interval edges get fractional weight, interior cells weight 1;
    if the interval extends past the image, the last cell absorbs the excess
    (the "residue scale-up", :202-236).

    ``quantize`` reproduces the 8U fast path's /256 fixed point. The X axis
    quantizes each partial alpha independently (the xofs table); the Y axis
    quantizes the *split* at each boundary row so the two shares sum to 256
    (beta / 256 - beta in the streaming loop, :78-118).
    """
    inv = 1.0 / scale  # source cells per output cell
    w = np.zeros((n_out, n_in), dtype=np.float64)
    if quantize and axis == "y":
        dy = 0
        dy_weight_256 = 0
        for sy in range(n_in):
            if dy >= n_out:
                break
            if (dy + 1) * inv <= sy + 1:
                beta = int(max(sy + 1 - (dy + 1) * inv, 0.0) * 256)
                beta1 = 256 - beta
                carry = int(inv * 256) if sy == n_in - 1 else beta
                if beta <= 0:
                    w[dy, sy] += 1.0  # full row, and nothing carries
                else:
                    w[dy, sy] += beta1 / 256.0
                    if dy + 1 < n_out:
                        w[dy + 1, sy] += carry / 256.0
                if sy == n_in - 1 and beta <= 0 and dy + 1 < n_out:
                    # residue rows past the image get the scaled-up carry
                    w[dy + 1, sy] += int(inv * 256) / 256.0
                dy_weight_256 = beta
                dy += 1
            else:
                if sy == n_in - 1:
                    w[dy, sy] += (int(inv * 256) - dy_weight_256) / 256.0
                else:
                    w[dy, sy] += 1.0
                    dy_weight_256 += 256
        return w  # unnormalized: caller divides by inv_scale_256
    for d in range(n_out):
        fs1 = d * inv
        fs2 = fs1 + inv
        s1 = int(fs1 + 1.0 - 1e-6)
        s2 = int(fs2)
        if s1 > fs1:
            a = (s1 - fs1)
            if quantize:
                a = int(a * 256) / 256.0
            w[d, min(s1 - 1, n_in - 1)] += a
        for s in range(s1, s2):
            w[d, min(s, n_in - 1)] += 1.0
        if fs2 - s2 > 1e-3:
            a = fs2 - s2
            if quantize:
                a = int(a * 256) / 256.0
            w[d, min(s2, n_in - 1)] += a
        if fs2 > n_in:  # residue scale-up at the boundary
            w[d, n_in - 1] += fs2 - n_in
    if not normalize:
        return w
    return (w / inv).astype(np.float64)


def cubic_weights(n_out: int, n_in: int, scale: float, quantize: bool) -> np.ndarray:
    """(n_out, n_in) cubic-convolution weights (A=-0.75), clamped indices."""
    A = -0.75
    inv = 1.0 / scale
    w = np.zeros((n_out, n_in), dtype=np.float64)
    for d in range(n_out):
        s = np.float32((d + 0.5) * inv - 0.5)
        si = int(s)
        x = float(s) - si
        c0 = ((A * (x + 1) - 5 * A) * (x + 1) + 8 * A) * (x + 1) - 4 * A
        c1 = ((A + 2) * x - (A + 3)) * x * x + 1
        c2 = ((A + 2) * (1 - x) - (A + 3)) * (1 - x) * (1 - x) + 1
        if quantize:  # x64 fixed point (_ccv_init_cubic_integer_coeffs)
            q0 = int(c0 * 64 + 0.5)
            q1 = int(c1 * 64 + 0.5)
            q2 = int(c2 * 64 + 0.5)
            q3 = 64 - q0 - q1 - q2
            coeffs = np.array([q0, q1, q2, q3], dtype=np.float64)
        else:
            c3 = 1.0 - c0 - c1 - c2
            coeffs = np.array([c0, c1, c2, c3], dtype=np.float64)
        for t, c in enumerate(coeffs):
            idx = min(max(si - 1 + t, 0), n_in - 1)
            w[d, idx] += c
    return w


# ---------------------------------------------------------------------------
# the resample op
# ---------------------------------------------------------------------------

def _apply_separable(img: jax.Array, wy: np.ndarray, wx: np.ndarray) -> jax.Array:
    """out[..., i, j, c] = sum_{y,x} wy[i,y] * wx[j,x] * img[..., y, x, c].

    Both contractions are MXU matmuls (einsum over the spatial axes).
    """
    wy_j = jnp.asarray(wy, dtype=jnp.float32)
    wx_j = jnp.asarray(wx, dtype=jnp.float32)
    x = img.astype(jnp.float32)
    # HIGHEST: the TPU MXU's default f32 path is bf16-accumulated, which
    # perturbs 8-bit pixel values enough to break golden-file parity
    x = jnp.einsum("iy,...yxc->...ixc", wy_j, x,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("jx,...ixc->...ijc", wx_j, x,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return x


def resample(a, rows: int = 0, cols: int = 0, rows_scale: float = 0.0,
             cols_scale: float = 0.0, interp: int = INTER_AREA):
    """ccv_resample twin. Output size = round(in * scale) unless given."""
    a, had = to_hwc(a)
    H, W = a.shape[-3], a.shape[-2]
    if not rows:
        rows = int(H * rows_scale + 0.5)
        cols = int(W * cols_scale + 0.5)
    if not rows_scale:
        rows_scale = rows / H
        cols_scale = cols / W
    if rows == H and cols == W:
        return from_hwc(a, had)
    is_int = jnp.issubdtype(a.dtype, jnp.integer)
    if (interp & INTER_AREA) and H >= rows and W >= cols:
        quant = a.dtype == jnp.uint8 and (H * W) // (rows * cols) < 0x100
        if quant:
            # 8U fast path (_ccv_resample_area_8u): quantized weights and a
            # truncating division by inv_scale_256 = int(sx*sy*65536)
            inv_scale_256 = int((1.0 / cols_scale) * (1.0 / rows_scale) * 0x10000)
            wy = area_weights(rows, H, rows_scale, quantize=True, axis="y",
                              normalize=False)
            wx = area_weights(cols, W, cols_scale, quantize=True, axis="x",
                              normalize=False)
            out = _apply_separable(a, wy, wx) * (65536.0 / inv_scale_256)
            out = jnp.clip(jnp.floor(out), 0, 255).astype(a.dtype)
            return from_hwc(out, had)
        wy = area_weights(rows, H, rows_scale, quantize=False)
        wx = area_weights(cols, W, cols_scale, quantize=False)
        out = _apply_separable(a, wy, wx)
    elif interp & (INTER_CUBIC | INTER_LINEAR | INTER_LANCZOS):
        wy = cubic_weights(rows, H, rows_scale, quantize=is_int)
        wx = cubic_weights(cols, W, cols_scale, quantize=is_int)
        out = _apply_separable(a, wy, wx)
        if is_int:
            # emulate ccv_descale(sum, 12): (sum + 2048) >> 12 on x64*x64 taps
            out = jnp.floor((out + 2048.0) / 4096.0)
    else:
        raise NotImplementedError(f"interp {interp:#x}")
    if is_int:
        out = jnp.clip(jnp.round(out) if not (interp & INTER_AREA) else jnp.floor(out + 0.5),
                       0, 255 if a.dtype == jnp.uint8 else None)
        out = out.astype(a.dtype)
    return from_hwc(out, had)


# ---------------------------------------------------------------------------
# exact-2x pyramid ops
# ---------------------------------------------------------------------------

def _sym_pad(x, before: int, after: int, axis: int):
    """Symmetric padding (edge value included): pad[-1] = a[0], pad[-2] = a[1]."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (before, after)
    return jnp.pad(x, pad, mode="symmetric")


def sample_down(a, src_x: int = 0, src_y: int = 0):
    """ccv_sample_down twin: exact 2x downsample, 5-tap [1,4,6,4,1] Gaussian.

    Output (i, j) pulls from source centers (2i+src_y, 2j+src_x), symmetric
    borders; integer inputs use exact int arithmetic with truncating /256.
    """
    a, had = to_hwc(a)
    H, W = a.shape[-3], a.shape[-2]
    oh, ow = H // 2, W // 2
    is_int = jnp.issubdtype(a.dtype, jnp.integer)
    work = a.astype(jnp.int32 if is_int else jnp.float32)
    taps = [1, 4, 6, 4, 1]

    def pass1d(x, axis, n_out, src):
        # pad so window centers 2*i + src with +/-2 reach are valid
        xp = _sym_pad(x, 2, max(0, 2 * (n_out - 1) + src + 2 - (x.shape[axis] - 1)), axis)
        acc = None
        for t, wgt in enumerate(taps):
            sl = [slice(None)] * x.ndim
            start = src + t  # (2*0 + src) - 2 + t + 2(pad)
            sl[axis] = slice(start, start + 2 * n_out, 2)
            term = xp[tuple(sl)] * wgt
            acc = term if acc is None else acc + term
        return acc

    out = pass1d(work, -2, ow, src_x)
    # the reference hard-codes asymmetric first/last-column taps
    # (lib/ccv_resample.c:524-556): first col = 10*a[sx] + 5*a[sx+1] + a[sx+2];
    # last col (src_x == 0) = 10*a[W-1] + 5*a[W-2] + a[W-3].
    first = work[..., src_x, :] * 10 + work[..., src_x + 1, :] * 5 + work[..., src_x + 2, :]
    out = out.at[..., 0, :].set(first)
    if src_x == 0:
        last = work[..., W - 1, :] * 10 + work[..., W - 2, :] * 5 + work[..., W - 3, :]
        out = out.at[..., ow - 1, :].set(last)
    out = pass1d(out, -3, oh, src_y)
    if is_int:
        out = out // 256  # C division truncation (values non-negative)
        if a.dtype == jnp.uint8:
            out = jnp.clip(out, 0, 255)
        out = out.astype(a.dtype)
    else:
        out = out / 256.0
    return from_hwc(out, had)


# sample_up 3-tap weights at distances 0.25 / 0.75 / 1.25 (lib/ccv_resample.c)
_UP_INT = (23, 8, 1)      # G025, G075, G125 quantized; GALL = 1024
_UP_FLT = (0.705385, 0.259496, 0.035119)


def sample_up(a, src_x: int = 0, src_y: int = 0):
    """ccv_sample_up twin: exact 2x upsample.

    even out[2i] = G075*a[i-1] + G025*a[i] + G125*a[i+1]
    odd  out[2i+1] = G125*a[i-1] + G025*a[i] + G075*a[i+1]
    symmetric borders; integer path divides by 1024 truncating.
    """
    a, had = to_hwc(a)
    is_int = jnp.issubdtype(a.dtype, jnp.integer)
    g025, g075, g125 = _UP_INT if is_int else _UP_FLT
    work = a.astype(jnp.int32 if is_int else jnp.float32)

    def pass1d(x, axis, src):
        n = x.shape[axis]
        # window for output pair i covers source (i+src-1 .. i+src+1);
        # the reference mirrors indices >= n symmetrically (its tab[])
        xp = _sym_pad(x, 1, src + 1, axis)

        def sl(shifted_start):
            s = [slice(None)] * x.ndim
            s[axis] = slice(shifted_start, shifted_start + n)
            return xp[tuple(s)]

        prev, cur, nxt = sl(src), sl(src + 1), sl(src + 2)
        even = prev * g075 + cur * g025 + nxt * g125
        odd = prev * g125 + cur * g025 + nxt * g075
        # interleave along `axis`: stack a new axis right after it, reshape
        stacked = jnp.stack([even, odd], axis=axis)  # negative axis: result pos
        new_shape = list(x.shape)
        new_shape[axis] = 2 * n
        return stacked.reshape(new_shape)

    out = pass1d(work, -2, src_x)
    out = pass1d(out, -3, src_y)
    if is_int:
        out = out // 1024
        if a.dtype == jnp.uint8:
            out = jnp.clip(out, 0, 255)
        out = out.astype(a.dtype)
    return from_hwc(out, had)
