"""LSSC activation compression (reference: lib/nnc/cmd/compression/
ccv_nnc_lssc_cpu_ref.c + ccv_nnc_symbolic_graph_memory_compression.c).

LSSC packs each 4x4 spatial block of an fp16 activation into two fp16
endpoints + 16 2-bit level indices (4:1). The reference inserts
compress/decompress nodes around the backward pass so conv activations
are stored compressed between forward and backward; here the same effect
comes from a custom_vjp wrapper: the forward saves the compressed input,
the backward decompresses and recomputes the VJP
(``Sequential.set_memory_compression``).

Quantization matches the reference kernel exactly: levels
[lo, 2/3 lo + 1/3 hi, 1/3 lo + 2/3 hi, hi], index
floor((x - (7/6 lo - 1/6 hi)) * 3/max(hi-lo, 1e-6)) clamped to [0, 3].
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _block4(x):
    """(..., H, W, C) -> (..., Hb, Wb, C, 16) with zero pad to 4-multiples.

    The reference pads partial blocks by replicating the block's first
    element (ccv_nnc_lssc_cpu_ref.c:54-58 fills a16 with apz[0]); since
    those lanes are never read back, any fill works — we use edge values
    so they can't distort the block min/max range."""
    H, W = x.shape[-3], x.shape[-2]
    ph = -H % 4
    pw = -W % 4
    if ph or pw:
        pad = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        x = jnp.pad(x, pad, mode="edge")
    Hp, Wp = x.shape[-3], x.shape[-2]
    lead = x.shape[:-3]
    n = len(lead)
    x = x.reshape(*lead, Hp // 4, 4, Wp // 4, 4, x.shape[-1])
    # (lead..., Hb, 4h, Wb, 4w, C) -> (lead..., Hb, Wb, C, 4h, 4w)
    x = x.transpose(*range(n), n, n + 2, n + 4, n + 1, n + 3)
    return x.reshape(*x.shape[:-2], 16)  # row-major h*4+w like the ref


def lssc_compress(x) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compress (..., H, W, C) float to (lo, hi, idx): fp16 endpoints per
    4x4 block + packed 2-bit indices (uint32)."""
    shape = x.shape
    blocks = _block4(x.astype(jnp.float32))  # (..., Hb, Wb, C, 16)
    lo = jnp.min(blocks, axis=-1)
    hi = jnp.max(blocks, axis=-1)
    lo16 = lo.astype(jnp.float16)
    hi16 = hi.astype(jnp.float16)
    lo32 = lo16.astype(jnp.float32)
    hi32 = hi16.astype(jnp.float32)
    abottom = lo32 * (7.0 / 6.0) - hi32 / 6.0
    ascale = 3.0 / jnp.maximum(hi32 - lo32, 1e-6)
    q = jnp.clip(((blocks - abottom[..., None]) * ascale[..., None])
                 .astype(jnp.int32), 0, 3).astype(jnp.uint32)
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)
    idx = jnp.sum(q << shifts, axis=-1).astype(jnp.uint32)
    return lo16, hi16, idx


def lssc_decompress(lo, hi, idx, shape) -> jax.Array:
    """Inverse of lssc_compress back to `shape` ((..., H, W, C))."""
    lo32 = lo.astype(jnp.float32)
    hi32 = hi.astype(jnp.float32)
    levels = jnp.stack([lo32, lo32 * (2.0 / 3.0) + hi32 / 3.0,
                        lo32 / 3.0 + hi32 * (2.0 / 3.0), hi32], axis=-1)
    levels = levels.astype(jnp.float16).astype(jnp.float32)
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)
    q = ((idx[..., None] >> shifts) & 3).astype(jnp.int32)  # (..., 16)
    vals = jnp.take_along_axis(levels, q, axis=-1)          # (..., 16)
    # (..., Hb, Wb, C, 16) -> (..., H, W, C)
    lead = vals.shape[:-4]
    n = len(lead)
    Hb, Wb, C = vals.shape[-4], vals.shape[-3], vals.shape[-2]
    v = vals.reshape(*lead, Hb, Wb, C, 4, 4)
    # (lead..., Hb, Wb, C, 4h, 4w) -> (lead..., Hb, 4h, Wb, 4w, C)
    v = v.transpose(*range(n), n, n + 3, n + 1, n + 4, n + 2)
    v = v.reshape(*lead, Hb * 4, Wb * 4, C)
    H, W = shape[-3], shape[-2]
    return v[..., :H, :W, :].astype(jnp.float16).astype(jnp.float32)


def compressed_apply(apply_fn, shape, dtype, training: bool):
    """Wrap a layer apply so the activation saved for backward is LSSC-
    compressed — the twin of inserting COMPRESSION_LSSC nodes around the
    backward (memory_compression.c). Forward output is exact; the backward
    runs on the decompressed (lossy) input, like the reference.

    shape/dtype/training are trace-time statics (closed over; custom_vjp
    residuals may only hold jax types)."""

    @jax.custom_vjp
    def wrapped(params, state, x, key):
        return apply_fn(params, state, x, training, key)

    def fwd(params, state, x, key):
        y = apply_fn(params, state, x, training, key)
        return y, (params, state, lssc_compress(x), key)

    def bwd(res, g):
        params, state, comp, key = res
        x = lssc_decompress(*comp, shape).astype(dtype)
        _, vjp = jax.vjp(
            lambda p, s, v: apply_fn(p, s, v, training, key),
            params, state, x)
        dp, ds, dx = vjp(g)
        return dp, ds, dx, None

    wrapped.defvjp(fwd, bwd)
    return wrapped


def reduced_apply(apply_fn, dtype, training: bool):
    """Memory reduction twin (ccv_nnc_symbolic_graph_memory_reduction,
    lib/nnc/ccv_nnc_symbolic_graph_memory_reduction.c): where the reference
    finds tensors that were up-converted to a larger datatype and kept
    alive for the backward pass, it keeps the smaller one and re-converts
    just before backward. Here the saved-for-backward activation is stored
    as bfloat16 and re-converted to `dtype` inside the VJP; the forward
    output stays exact."""

    @jax.custom_vjp
    def wrapped(params, state, x, key):
        return apply_fn(params, state, x, training, key)

    def fwd(params, state, x, key):
        y = apply_fn(params, state, x, training, key)
        return y, (params, state, x.astype(jnp.bfloat16), key)

    def bwd(res, g):
        params, state, x16, key = res
        x = x16.astype(dtype)
        _, vjp = jax.vjp(
            lambda p, s, v: apply_fn(p, s, v, training, key),
            params, state, x)
        dp, ds, dx = vjp(g)
        return dp, ds, dx, None

    wrapped.defvjp(fwd, bwd)
    return wrapped
