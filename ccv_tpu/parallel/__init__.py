"""Mesh + collectives, and the parallelism axes beyond the reference:
sequence (ring attention), pipeline (GPipe), with expert parallelism in
ccv_tpu.nn.moe and tensor parallelism in models.transformer.shardings."""

from ccv_tpu.parallel.mesh import (
    comm_allreduce,
    comm_broadcast,
    comm_reduce,
    data_parallel_mesh,
    device_count,
    make_mesh,
    shard_batch,
    replicate,
)

__all__ = [
    "comm_allreduce", "comm_broadcast", "comm_reduce", "data_parallel_mesh",
    "device_count", "make_mesh", "shard_batch", "replicate",
]
