"""Flash attention as a Pallas TPU kernel.

Twin of the reference's fused attention backends
(lib/nnc/cmd/scaled_dot_product_attention/gpu/..._flash_attn.cu — vendored
FlashAttention-2 CUDA — and lib/nnc/mfa/ccv_nnc_mfa_attention.cpp), built
TPU-native: the (B*H, Tq, Tk) score matrix never materializes in HBM; each
(q-block, k-block) tile streams through VMEM with the online-softmax
running max/denominator kept in VMEM scratch across the innermost grid
axis (TPU pallas grids execute sequentially, so scratch carries state).

Training uses the Pallas backward kernels below (FlashAttention-2
recompute backward: dq accumulated over k-blocks, dk/dv over q-blocks,
LSE rows carried from the forward broadcast onto 128 lanes — the layout
the TPU vector unit wants). ``FLASH_BWD=xla`` falls back to the plain-XLA
recomputed-scores vjp; on the CPU backend the XLA form is the default
(the interpreter is for parity tests only).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

FLASH_BWD = os.environ.get("FLASH_BWD", "")  # "pallas"/"xla" force; ""=auto


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                  acc_scr, *, scale: float, causal: bool, bq: int, bk: int,
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
        if lse_ref is not None:
            lse_ref[0] = jnp.broadcast_to(
                m_scr[:, :1] + jnp.log(jnp.maximum(l, 1e-30)),
                lse_ref.shape[1:])


def _interpret() -> bool:
    # CPU (the CI test env) only supports the pallas interpreter
    return jax.default_backend() == "cpu"


def _flash_fwd_bthd(q, k, v, scale: float, causal: bool,
                    block_q: int = 512, block_k: int = 512,
                    with_lse: bool = False):
    """q: (BH, Tq, D), k/v: (BH, Tk, D) with D padded to a lane multiple.
    with_lse also returns the per-row log-sum-exp (BH, Tq_pad, 128)
    (broadcast over lanes) for the backward kernels."""
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
    impl = functools.partial(
        _flash_kernel, scale=scale, causal=causal, bq=bq, bk=bk,
        t_q=t_q, t_k=t_k)
    if with_lse:
        kernel = impl
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
            impl(q_ref, k_ref, v_ref, o_ref, None, m_scr, l_scr, acc_scr)
    out_shape = [jax.ShapeDtypeStruct(qp.shape, q.dtype)]
    out_specs = [pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                              memory_space=pltpu.VMEM)]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((bh, qp.shape[1], 128),
                                              jnp.float32))
        out_specs.append(pl.BlockSpec((1, bq, 128), lambda b, i, j: (b, i, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
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
    if with_lse:
        out, lse = res
        return (out[:, :t_q] if pq else out), lse
    out = res[0]
    return out[:, :t_q] if pq else out


# ---------------------------------------------------------------------------
# backward kernels (FlashAttention-2 recompute backward)
# ---------------------------------------------------------------------------


def _valid_mask(i, j, bq, bk, t_q, t_k, causal):
    q_pos = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    k_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    valid = (k_pos < t_k) & (q_pos < t_q)
    if causal:
        valid = valid & (k_pos <= q_pos + (t_k - t_q))
    return valid


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref, dq_ref,
               dq_scr, *, scale: float, causal: bool, bq: int, bk: int,
               t_q: int, t_k: int):
    i = pl.program_id(1)
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    block_needed = True
    if causal:
        block_needed = j * bk <= i * bq + bq - 1 + (t_k - t_q)

    @pl.when(block_needed)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (bq, bk)
        p = jnp.exp(s - lse_ref[0][:, :1])
        p = jnp.where(_valid_mask(i, j, bq, bk, t_q, t_k, causal), p, 0.0)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (bq, bk)
        ds = p * (dp - dlt_ref[0][:, :1]) * scale
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (bq, d)

    @pl.when(j == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref, dk_ref,
                dv_ref, dk_scr, dv_scr, *, scale: float, causal: bool,
                bq: int, bk: int, t_q: int, t_k: int):
    j = pl.program_id(1)   # k-block (outer)
    i = pl.program_id(2)   # q-block (inner, accumulated)
    nq = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    block_needed = True
    if causal:
        block_needed = i * bq + bq - 1 + (t_k - t_q) >= j * bk

    @pl.when(block_needed)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        do = do_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (bq, bk)
        p = jnp.exp(s - lse_ref[0][:, :1])
        p = jnp.where(_valid_mask(i, j, bq, bk, t_q, t_k, causal), p, 0.0)
        pc = p.astype(do.dtype)
        dv_scr[:] += jax.lax.dot_general(
            pc, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (bk, d)
        dp = jax.lax.dot_general(
            do, v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (bq, bk)
        ds = (p * (dp - dlt_ref[0][:, :1]) * scale).astype(q.dtype)
        dk_scr[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (bk, d)

    @pl.when(i == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_bthd(q, k, v, do, lse, delta, scale: float, causal: bool,
                    block_q: int = 512, block_k: int = 512):
    """Backward in (BH, T, D) layout. lse/delta: (BH, Tq, 128) f32 with
    the row value broadcast over lanes (padded rows carry +inf lse so the
    recomputed p underflows to exactly 0 there — and are masked anyway)."""
    bh, t_q, d = q.shape
    t_k = k.shape[1]
    bq = min(block_q, max(8, t_q))
    bk = min(block_k, max(8, t_k))
    pq = -t_q % bq
    pk = -t_k % bk
    qp = jnp.pad(q, ((0, 0), (0, pq), (0, 0))) if pq else q
    dop = jnp.pad(do, ((0, 0), (0, pq), (0, 0))) if pq else do
    kp = jnp.pad(k, ((0, 0), (0, pk), (0, 0))) if pk else k
    vp = jnp.pad(v, ((0, 0), (0, pk), (0, 0))) if pk else v
    nq = qp.shape[1] // bq
    nk = kp.shape[1] // bk
    interp = _interpret()
    common = dict(scale=scale, causal=causal, bq=bq, bk=bk,
                  t_q=t_q, t_k=t_k)
    qspec = pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, bq, 128), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        interpret=interp,
        grid=(bh, nq, nk),
        in_specs=[qspec, kspec, kspec, qspec, lspec, lspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * t_q * t_k * d,
            bytes_accessed=(qp.size * 3 + kp.size + vp.size) * 2,
            transcendentals=bh * t_q * t_k,
        ),
    )(qp, kp, vp, dop, lse, delta)
    # k-outer grid: the same index maps with (i, j) swapped by the grid
    qspec2 = pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0),
                          memory_space=pltpu.VMEM)
    lspec2 = pl.BlockSpec((1, bq, 128), lambda b, j, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **common),
        interpret=interp,
        grid=(bh, nk, nq),
        in_specs=[qspec2, kspec2, kspec2, qspec2, lspec2, lspec2],
        out_specs=[kspec2, kspec2],
        out_shape=[jax.ShapeDtypeStruct(kp.shape, k.dtype),
                   jax.ShapeDtypeStruct(vp.shape, v.dtype)],
        scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32),
                        pltpu.VMEM((bk, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * t_q * t_k * d,
            bytes_accessed=(qp.size * 3 + kp.size * 2 + vp.size * 2) * 2,
            transcendentals=bh * t_q * t_k,
        ),
    )(qp, kp, vp, dop, lse, delta)
    dq = dq[:, :t_q] if pq else dq
    dk = dk[:, :t_k] if pk else dk
    dv = dv[:, :t_k] if pk else dv
    return dq, dk, dv


def _to_bthd(x, b, h, t, d, dp):
    xt = x.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    return jnp.pad(xt, ((0, 0), (0, 0), (0, dp))) if dp else xt


def _from_bthd(x, b, h, t, d):
    return x[..., :d].reshape(b, h, t, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, scale: Optional[float] = None,
                    is_causal: bool = False):
    """Fused scaled-dot-product attention, (B, T, H, D) layout (the
    reference SDPA convention, ccv_nnc.h:262-267). Numerically matches
    ``nn.ops.scaled_dot_product_attention`` (parity-tested)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, t_q, h, d = q.shape
    t_k = k.shape[1]
    dp = -d % 128
    qt = _to_bthd(q, b, h, t_q, d, dp)
    kt = _to_bthd(k, b, h, t_k, d, dp)
    vt = _to_bthd(v, b, h, t_k, d, dp)
    out = _flash_fwd_bthd(qt, kt, vt, float(scale), bool(is_causal))
    return _from_bthd(out, b, h, t_q, d)


def _use_pallas_bwd() -> bool:
    if FLASH_BWD in ("pallas", "xla"):
        return FLASH_BWD == "pallas"
    return jax.default_backend() != "cpu"


def _flash_forward(q, k, v, scale, is_causal):
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if not _use_pallas_bwd():
        # XLA-backward mode: forward kernel without the LSE output
        return flash_attention(q, k, v, scale, is_causal), (q, k, v, None,
                                                            None)
    b, t_q, h, d = q.shape
    t_k = k.shape[1]
    dp = -d % 128
    qt = _to_bthd(q, b, h, t_q, d, dp)
    kt = _to_bthd(k, b, h, t_k, d, dp)
    vt = _to_bthd(v, b, h, t_k, d, dp)
    out, lse = _flash_fwd_bthd(qt, kt, vt, float(scale), bool(is_causal),
                               with_lse=True)
    o = _from_bthd(out, b, h, t_q, d)
    return o, (q, k, v, o, lse)


def _flash_backward(scale, is_causal, res, g):
    q, k, v, o, lse = res
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if lse is None:
        # plain-XLA backward (recomputes the scores; exact gradient)
        from ccv_tpu.nn import ops

        def ref(q, k, v):
            return ops.scaled_dot_product_attention(
                q, k, v, scale=scale, is_causal=is_causal)

        _, vjp = jax.vjp(ref, q, k, v)
        return vjp(g)
    b, t_q, h, d = q.shape
    t_k = k.shape[1]
    dp = -d % 128
    # delta_i = rowsum(dO_i * O_i), broadcast over 128 lanes like lse
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = delta.transpose(0, 2, 1).reshape(b * h, t_q)
    pq = lse.shape[1] - t_q
    if pq:
        delta = jnp.pad(delta, ((0, 0), (0, pq)))
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 128))
    qt = _to_bthd(q, b, h, t_q, d, dp)
    kt = _to_bthd(k, b, h, t_k, d, dp)
    vt = _to_bthd(v, b, h, t_k, d, dp)
    dot = _to_bthd(g.astype(q.dtype), b, h, t_q, d, dp)
    dq, dk, dv = _flash_bwd_bthd(qt, kt, vt, dot, lse, delta,
                                 float(scale), bool(is_causal))
    return (_from_bthd(dq, b, h, t_q, d).astype(q.dtype),
            _from_bthd(dk, b, h, t_k, d).astype(k.dtype),
            _from_bthd(dv, b, h, t_k, d).astype(v.dtype))


flash_attention.defvjp(_flash_forward, _flash_backward)
