"""Flash attention as a Pallas TPU kernel.

Twin of the reference's fused attention backends
(lib/nnc/cmd/scaled_dot_product_attention/gpu/..._flash_attn.cu — vendored
FlashAttention-2 CUDA — and lib/nnc/mfa/ccv_nnc_mfa_attention.cpp), built
TPU-native: the (B*H, Tq, Tk) score matrix never materializes in HBM; each
(q-block, k-block) tile streams through VMEM with the online-softmax
running max/denominator kept in VMEM scratch across the innermost grid
axis (TPU pallas grids execute sequentially, so scratch carries state).

Forward-only kernel; training wraps it in jax.custom_vjp with the plain
XLA backward (exact same math, recomputed scores).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, scale: float, causal: bool, bq: int, bk: int,
                  t_q: int, t_k: int):
    i = pl.program_id(1)
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # causal: whole k-block above the diagonal band contributes nothing
    block_needed = True
    if causal:
        block_needed = j * bk <= i * bq + bq - 1 + (t_k - t_q)

    @pl.when(block_needed)
    def _compute():
        q = q_ref[0]  # (bq, d)
        k = k_ref[0]  # (bk, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (bq, bk)
        k_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        valid = k_pos < t_k  # padded tail of the k axis
        if causal:
            q_pos = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            valid = valid & (k_pos <= q_pos + (t_k - t_q))
        s = jnp.where(valid, s, NEG_INF)
        m_prev = m_scr[:, :1]                          # (bq, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)     # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                         # (bq, bk)
        corr = jnp.exp(m_prev - m_new)                 # (bq, 1)
        l_scr[:, :1] = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[:, :1] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (bq, d)
        acc_scr[:] = acc_scr[:] * corr + pv

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_fwd_bthd(q, k, v, scale: float, causal: bool,
                    block_q: int = 512, block_k: int = 512):
    """q: (BH, Tq, D), k/v: (BH, Tk, D) with D padded to a lane multiple."""
    bh, t_q, d = q.shape
    t_k = k.shape[1]
    bq = min(block_q, max(8, t_q))
    bk = min(block_k, max(8, t_k))
    pq = -t_q % bq
    pk = -t_k % bk
    qp = jnp.pad(q, ((0, 0), (0, pq), (0, 0))) if pq else q
    kp = jnp.pad(k, ((0, 0), (0, pk), (0, 0))) if pk else k
    vp = jnp.pad(v, ((0, 0), (0, pk), (0, 0))) if pk else v
    nq = qp.shape[1] // bq
    nk = kp.shape[1] // bk
    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, bq=bq, bk=bk,
        t_q=t_q, t_k=t_k)
    # CPU (the CI test env) only supports the pallas interpreter
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # running max
            pltpu.VMEM((bq, 128), jnp.float32),  # running denominator
            pltpu.VMEM((bq, d), jnp.float32),    # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t_q * t_k * d,
            bytes_accessed=(qp.size + kp.size + vp.size + qp.size) * 2,
            transcendentals=bh * t_q * t_k,
        ),
    )(qp, kp, vp)
    return out[:, :t_q] if pq else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, scale: Optional[float] = None,
                    is_causal: bool = False):
    """Fused scaled-dot-product attention, (B, T, H, D) layout (the
    reference SDPA convention, ccv_nnc.h:262-267). Numerically matches
    ``nn.ops.scaled_dot_product_attention`` (parity-tested)."""
    return _flash_forward(q, k, v, scale, is_causal)[0]


def _flash_forward(q, k, v, scale, is_causal):
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, t_q, h, d = q.shape
    t_k = k.shape[1]
    # lanes want 128; zero-pad D (zero K columns don't change logits, zero
    # V columns are stripped after)
    dp = -d % 128
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, t_q, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, t_k, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, t_k, d)
    if dp:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, dp)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, dp)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, dp)))
    out = _flash_fwd_bthd(qt, kt, vt, float(scale), bool(is_causal))
    if dp:
        out = out[..., :d]
    out = out.reshape(b, h, t_q, d).transpose(0, 2, 1, 3)
    return out, (q, k, v)


def _flash_backward(scale, is_causal, res, g):
    """Plain-XLA backward (recomputes the scores; exact gradient)."""
    from ccv_tpu.nn import ops

    q, k, v = res

    def ref(q, k, v):
        return ops.scaled_dot_product_attention(
            q, k, v, scale=scale, is_causal=is_causal)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_forward, _flash_backward)
