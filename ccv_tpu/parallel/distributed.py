"""Multi-host initialization (SURVEY 5.8: the reference is single-process
multi-GPU NCCL only; multi-host is new TPU-native design).

jax.distributed wires hosts into one logical runtime: every host sees the
global device set, GSPMD shardings span slices (ICI) and pods (DCN).

    from ccv_tpu.parallel import distributed
    distributed.init()                 # from TPU metadata / env
    mesh = distributed.global_mesh(("data",))
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> bool:
    """jax.distributed.initialize with env fallbacks; returns True when a
    multi-process runtime came up (False = single-process, no-op)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "CCV_TPU_COORDINATOR")
    if num_processes is None and "CCV_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["CCV_TPU_NUM_PROCESSES"])
    if process_id is None and "CCV_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["CCV_TPU_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # TPU pods auto-discover through the runtime metadata; calling with
        # no args is safe there and a no-op error elsewhere
        try:
            jax.distributed.initialize()
            return jax.process_count() > 1
        except Exception:  # noqa: BLE001 - single-host fallback
            return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(axis_names: Sequence[str],
                shape: Optional[Tuple[int, ...]] = None):
    """A Mesh over ALL processes' devices (jax.devices() is global after
    init). Default shape: all devices on the first axis."""
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), tuple(axis_names))


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()
