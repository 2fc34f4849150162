"""Mesh / collective utilities — the TPU-native equivalent of the
reference's data-parallel graph transform + NCCL backend
(lib/nnc/ccv_nnc_symbolic_graph_parallel.c:24, lib/nnc/cmd/comm/).

The reference duplicates the GPU sub-graph onto N devices and inserts
COMM_ALLREDUCE / COMM_BROADCAST / COMM_REDUCE nodes executed by NCCL.
On TPU the same roles are:

- ``make_mesh`` / ``data_parallel_mesh``: a jax Mesh over the chips; the
  "graph duplication" is GSPMD partitioning under jit.
- ``shard_batch`` / ``replicate``: NamedShardings for inputs/parameters —
  the moral equivalent of the transform rewriting tensor symbols with
  device ids.
- ``comm_*``: the collective command set itself for shard_map code. The
  autodiff rules match the reference's (allreduce backward = allreduce,
  broadcast backward = reduce, cmd/comm/ccv_nnc_comm.c:97-160) because
  that's exactly how jax defines the VJPs of psum et al.

Multi-host: jax.distributed handles rendezvous; the same mesh code runs
unchanged on a slice (ICI) or across slices (DCN) — the reference had no
multi-host story at all (SURVEY.md 5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_count(kind: Optional[str] = None) -> int:
    """ccv_nnc_device_count twin (ccv_nnc.h:1070)."""
    return jax.device_count()


def make_mesh(axes: dict, devices=None) -> Mesh:
    """Build a Mesh from {axis_name: size}; sizes must multiply to ndev."""
    devices = devices if devices is not None else jax.devices()
    names = tuple(axes.keys())
    sizes = tuple(axes.values())
    total = int(np.prod(sizes))
    assert total <= len(devices), f"need {total} devices, have {len(devices)}"
    arr = np.array(devices[:total]).reshape(sizes)
    return Mesh(arr, names)


def data_parallel_mesh(n: Optional[int] = None) -> Mesh:
    """The `ccv_cnnp_model_set_data_parallel(n)` mesh: one 'data' axis."""
    n = n or jax.device_count()
    return make_mesh({"data": n})


def shard_batch(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# -- collective command set (for shard_map bodies) ---------------------------

def comm_allreduce(x, axis_name: str = "data"):
    """CCV_NNC_COMM_ALLREDUCE_FORWARD (sum — the only reduce op the
    reference supports, parallel.c)."""
    return jax.lax.psum(x, axis_name)


def comm_broadcast(x, axis_name: str = "data", root: int = 0):
    """CCV_NNC_COMM_BROADCAST_FORWARD: everyone takes root's value."""
    idx = jax.lax.axis_index(axis_name)
    masked = jnp.where(idx == root, x, jnp.zeros_like(x))
    return jax.lax.psum(masked, axis_name)


def comm_reduce(x, axis_name: str = "data", root: int = 0):
    """CCV_NNC_COMM_REDUCE_FORWARD: sum delivered to root (others get the
    sum too under SPMD — harmless superset, matching psum semantics)."""
    return jax.lax.psum(x, axis_name)


def all_gather(x, axis_name: str):
    return jax.lax.all_gather(x, axis_name)


def reduce_scatter(x, axis_name: str):
    return jax.lax.psum_scatter(x, axis_name)


def ppermute(x, axis_name: str, perm):
    return jax.lax.ppermute(x, axis_name, perm)
