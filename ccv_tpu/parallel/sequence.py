"""Sequence/context parallelism: ring attention over the device mesh.

SURVEY §5.7: the reference has NO long-context story (its SDPA is a
single-device op); this is the TPU-native design the survey calls for —
shard the sequence axis over the mesh with shard_map, stream K/V blocks
around the ring with ppermute (ICI neighbor exchange), and merge each
block's contribution with the online-softmax rule, so no device ever holds
more than its T/n shard of K/V or an (T/n, T/n) score tile.

Usable today on the 8-virtual-device CPU mesh (tests) and any TPU slice.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attend(q, k, v, scale, q_off, k_off, t_total, causal):
    """Partial (unnormalized) attention of a q shard vs one k/v block.

    Returns (m, l, acc): row max, row sum of exp, weighted V accumulator —
    the online-softmax sufficient statistics for this block.
    q: (B, Tq, H, D), k/v: (B, Tk, H, D); offsets are absolute positions.
    """
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    tq, tk = q.shape[1], k.shape[1]
    if causal:
        q_pos = q_off + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        k_pos = k_off + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        s = jnp.where((k_pos <= q_pos)[None, None], s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)              # (B, H, Tq, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bkhd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return m, l, acc


def _ring_attention_shard(q, k, v, *, axis_name: str, axis_size: int,
                          scale: float, causal: bool, t_total: int):
    """Runs INSIDE shard_map: local q/k/v shards of shape (B, T/n, H, D).

    axis_size is threaded explicitly (NOT read from a process-global keyed
    by axis name): two meshes with the same axis name but different sizes
    in one process must each get their own static ring unroll.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    t_local = q.shape[1]
    q_off = idx * t_local
    B, _, H, D = q.shape
    m = jnp.full((B, H, t_local, 1), -1e30, jnp.float32)
    l = jnp.zeros_like(m)
    acc = jnp.zeros((B, H, t_local, D), jnp.float32)
    k_cur, v_cur = k, v

    def merge(m, l, acc, mb, lb, accb):
        m_new = jnp.maximum(m, mb)
        c_old = jnp.exp(m - m_new)
        c_new = jnp.exp(mb - m_new)
        return (m_new, l * c_old + lb * c_new,
                acc * c_old + accb * c_new)

    # static unroll over ring steps (axis_size is known at trace time)
    for s_step in range(axis_size):
        src = (idx - s_step) % n          # whose k/v block we hold now
        k_off = src * t_local
        mb, lb, accb = _block_attend(q, k_cur, v_cur, scale,
                                     q_off, k_off, t_total, causal)
        m, l, acc = merge(m, l, acc, mb, lb, accb)
        if s_step != axis_size - 1:
            pairs = [(i, (i + 1) % axis_size) for i in range(axis_size)]
            k_cur = jax.lax.ppermute(k_cur, axis_name, pairs)
            v_cur = jax.lax.ppermute(v_cur, axis_name, pairs)
    out = acc / jnp.maximum(l, 1e-30)
    return jnp.einsum("bhqd->bqhd", out).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, seq_axis: str = "seq",
                   scale: Optional[float] = None, is_causal: bool = False,
                   batch_axis: Optional[str] = None,
                   head_axis: Optional[str] = None):
    """Sequence-parallel scaled-dot-product attention.

    q, k, v: (B, T, H, D) global arrays (or already sharded on T over
    `seq_axis`). T must divide evenly by the axis size. Each device
    computes its q shard against the full sequence by circulating k/v
    shards around the ring — peak per-device memory is O(T/n).

    batch_axis / head_axis optionally shard B / H over additional mesh
    axes (data and tensor parallelism composed with the ring): the shard
    body is per-device local compute + ppermute over `seq_axis` only, so
    extra sharded axes just shrink the local block.
    """
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    t_total = q.shape[1]
    n = mesh.shape[seq_axis]
    assert t_total % n == 0, (t_total, n)
    spec = P(batch_axis, seq_axis, head_axis, None)
    fn = shard_map(
        functools.partial(_ring_attention_shard, axis_name=seq_axis,
                          axis_size=int(n), scale=float(scale),
                          causal=bool(is_causal), t_total=t_total),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)
