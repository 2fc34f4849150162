"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh
axis.

The reference has no pipeline parallelism (SURVEY §2.5: "must be designed
fresh for TPU"); its closest analog is cwc's hand-rolled model
parallelism (lib/cuda/cwc_convnet.cu). TPU-native design:

- the S pipeline stages live one-per-device on a 'stage' mesh axis, with
  the stacked stage parameters sharded on their leading axis;
- `shard_map` + `lax.ppermute` circulate activations around the ring: at
  step t, device s runs its stage on the microbatch that entered the
  pipe at t-s, then passes the result to s+1 — the classic GPipe
  schedule expressed as a `lax.scan` over (microbatches + stages - 1)
  ticks, so the whole pipeline is ONE compiled program;
- every device computes every tick (on garbage during fill/drain, masked
  at the edges), which is exactly the bubble the GPipe schedule pays.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _stage_specs(params, axis: str):
    return jax.tree_util.tree_map(
        lambda p: P(*((axis,) + (None,) * (np.ndim(p) - 1))), params)


def stage_params_sharding(params, mesh: Mesh, axis: str = "stage"):
    """Stacked per-stage params (leading dim = stage) sharded over `axis`."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), _stage_specs(params, axis))


def gpipe(stage_fn: Callable[[Any, jax.Array], jax.Array],
          stage_params, x_mb, mesh: Mesh, axis: str = "stage"):
    """Run a homogeneous S-stage pipeline over the microbatch stack.

    stage_fn(params_s, x) -> y: one stage's computation (same shape in
    and out — the homogeneous-transformer-block case).
    stage_params: pytree with leading dim S (stacked per-stage params).
    x_mb: (M, B, ...) microbatch stack.
    Returns (M, B, ...) outputs after all S stages.
    """
    S = mesh.shape[axis]
    M = x_mb.shape[0]

    def per_device(params, xs):
        # params: this device's stage params (leading dim 1); xs: full
        # microbatch stack (replicated)
        p = jax.tree_util.tree_map(lambda a: a[0], params)
        sidx = jax.lax.axis_index(axis)
        mb_shape = xs.shape[1:]
        carry_in = jnp.zeros(mb_shape, xs.dtype)
        outs = jnp.zeros_like(xs)
        # the carry becomes stage-varying after the first ppermute; mark
        # the initial values as varying so the scan carry type is stable
        if hasattr(jax.lax, "pcast"):
            carry_in = jax.lax.pcast(carry_in, (axis,), to="varying")
            outs = jax.lax.pcast(outs, (axis,), to="varying")

        def tick(state, t):
            carry, outs = state
            # stage 0 ingests microbatch t (if still filling)
            feed = xs[jnp.clip(t, 0, M - 1)]
            x_in = jnp.where(sidx == 0, feed, carry)
            # keep the scan carry dtype stable even when stage_fn
            # promotes (e.g. bf16 activations through f32 params)
            y = stage_fn(p, x_in).astype(xs.dtype)
            # last stage retires microbatch t - (S - 1)
            ridx = t - (S - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                outs, y, jnp.maximum(ridx, 0), 0)
            outs = jnp.where((sidx == S - 1) & (ridx >= 0), upd, outs)
            # pass activations down the ring (last->first wraps, ignored)
            nxt = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % S) for i in range(S)])
            return (nxt, outs), None

        (carry, outs), _ = jax.lax.scan(
            tick, (carry_in, outs), jnp.arange(M + S - 1))
        # only the last stage's `outs` is populated; psum-broadcast it
        keep = (sidx == S - 1).astype(outs.dtype)
        outs = jax.lax.psum(outs * keep, axis)
        return outs

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    param_specs = _stage_specs(stage_params, axis)
    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P())
    return fn(stage_params, x_mb)
