"""Mixture-of-Experts feed-forward with expert parallelism.

The reference has no MoE (SURVEY §2.5: expert parallelism is "not present
in the reference — must be designed fresh for TPU"). This is the
TPU-native design:

- **dense dispatch**: routing is top-k softmax over a learned router; the
  token->expert dispatch/combine are one-hot einsums with a fixed
  per-expert capacity — static shapes, no data-dependent control flow, so
  the whole layer jits to MXU matmuls (the standard GShard/Switch
  formulation).
- **expert parallelism**: `shardings()` places each expert's weights on
  one slice of an 'expert' mesh axis; with tokens sharded on 'data',
  GSPMD inserts the all-to-alls around the expert matmuls (the role a
  hand-written NCCL alltoall would play elsewhere).
- aux load-balance loss (Switch-style fraction*prob product) comes back
  with the output so trainers can add it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    dim: int
    ff: int
    experts: int
    top_k: int = 2
    capacity_factor: float = 1.25


def init(key, cfg: MoEConfig) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    scale1 = (6.0 / (cfg.dim + cfg.ff)) ** 0.5
    return {
        "router": jax.random.normal(k1, (cfg.dim, cfg.experts)) * 0.02,
        "w1": jax.random.uniform(k2, (cfg.experts, cfg.dim, cfg.ff),
                                 jnp.float32, -scale1, scale1),
        "b1": jnp.zeros((cfg.experts, cfg.ff)),
        "w2": jax.random.uniform(k3, (cfg.experts, cfg.ff, cfg.dim),
                                 jnp.float32, -scale1, scale1),
        "b2": jnp.zeros((cfg.experts, cfg.dim)),
    }


def shardings(params, mesh: Mesh, axis: str = "model"):
    """Expert-parallel placement: expert dim sharded over `axis`."""
    spec = {
        "router": P(),
        "w1": P(axis, None, None), "b1": P(axis, None),
        "w2": P(axis, None, None), "b2": P(axis, None),
    }
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def _fit(param, s):
        fixed = tuple(
            (a if a is None or param.shape[i] % axis_sizes.get(a, 1) == 0
             else None) for i, a in enumerate(s))
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map(_fit, params, spec)


def forward(params, cfg: MoEConfig, x,
            capacity: Optional[int] = None) -> Tuple[jax.Array, jax.Array]:
    """x (..., T, D) -> (out (..., T, D), aux_loss scalar).

    Tokens beyond an expert's capacity are dropped (their combine weight
    is zero and the residual path — caller's responsibility — carries
    them), exactly the GShard/Switch behavior."""
    orig_shape = x.shape
    D = orig_shape[-1]
    t = x.reshape(-1, D)                       # (N, D)
    N = t.shape[0]
    E, K = cfg.experts, cfg.top_k
    if capacity is None:
        capacity = max(1, int(cfg.capacity_factor * N * K / E))
    C = capacity

    logits = t @ params["router"]              # (N, E)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    gate_vals, gate_idx = jax.lax.top_k(probs, K)     # (N, K)
    # renormalize the top-k gates
    gate_vals = gate_vals / jnp.maximum(
        jnp.sum(gate_vals, -1, keepdims=True), 1e-9)

    # position of each (token, k) in its expert's buffer: rank among
    # earlier tokens routed to the same expert
    onehot = jax.nn.one_hot(gate_idx, E, dtype=jnp.int32)  # (N, K, E)
    flatoh = onehot.reshape(N * K, E)
    # log-depth scan: jnp.cumsum lowers to a quadratic reduce-window on
    # TPU ((N*K)^2 * E element reads at LM batch sizes)
    pos_in_expert = jax.lax.associative_scan(
        jnp.add, flatoh, axis=0) - flatoh                  # (N*K, E)
    pos = jnp.sum(pos_in_expert * flatoh, axis=-1).reshape(N, K)
    keep = pos < C

    # dispatch tensor (N, K) -> buffers (E, C, D)
    eidx = gate_idx                                   # (N, K)
    flat_slot = eidx * C + jnp.where(keep, pos, C - 1)
    disp = jnp.zeros((E * C, D), t.dtype)
    w_keep = keep.astype(t.dtype)
    contrib = (t[:, None, :] * w_keep[..., None]).reshape(N * K, D)
    disp = disp.at[flat_slot.reshape(-1)].add(contrib)
    buffers = disp.reshape(E, C, D)

    # expert FFN: batched matmuls, expert dim shardable
    h = jax.nn.gelu(jnp.einsum("ecd,edf->ecf", buffers, params["w1"])
                    + params["b1"][:, None, :])
    y = (jnp.einsum("ecf,efd->ecd", h, params["w2"])
         + params["b2"][:, None, :])                  # (E, C, D)

    # combine: each (token, k) reads its slot, weighted by its gate
    y_flat = y.reshape(E * C, D)
    gathered = y_flat[flat_slot.reshape(-1)].reshape(N, K, D)
    out = jnp.sum(gathered * (gate_vals * keep)[..., None], axis=1)

    # Switch load-balance aux loss: E * sum_e fraction_e * mean_prob_e
    me = jnp.mean(probs, axis=0)
    fe = jnp.sum(jax.nn.one_hot(gate_idx[:, 0], E, dtype=jnp.float32),
                 axis=0) / N
    aux = E * jnp.sum(fe * me)
    return out.reshape(orig_shape).astype(x.dtype), aux
