"""Runtime flag system (reference: ccv_nnc_enable_flag / disable_flag /
ccv_nnc_flags, lib/nnc/ccv_nnc.h:30-48).

The reference's flags gate accelerated backends (e.g. disable Metal flash
attention); ours gate the TPU equivalents. Flags initialize from the
CCV_TPU_FLAGS env var (comma-separated names) so deployments can flip
behavior without code changes.
"""

from __future__ import annotations

import os

# system-wide flag bits (the TPU-relevant analogs of ccv_nnc.h:31-35)
DISABLE_PALLAS_FLASH_ATTENTION = 0x1   # force plain-XLA SDPA everywhere
DISABLE_STAGED_CASCADE = 0x2           # SCD: evaluate all stages densely
DISABLE_NATIVE_RUNTIME = 0x4           # skip the C++ runtime (pure python)
DISABLE_PERSISTENT_COMPILE_CACHE = 0x8
DISABLE_MEMORY_COMPRESSION = 0x10      # ignore set_memory_compression

_NAMES = {
    "disable_pallas_flash_attention": DISABLE_PALLAS_FLASH_ATTENTION,
    "disable_staged_cascade": DISABLE_STAGED_CASCADE,
    "disable_native_runtime": DISABLE_NATIVE_RUNTIME,
    "disable_persistent_compile_cache": DISABLE_PERSISTENT_COMPILE_CACHE,
    "disable_memory_compression": DISABLE_MEMORY_COMPRESSION,
}

_flags = 0
for _name in os.environ.get("CCV_TPU_FLAGS", "").split(","):
    _name = _name.strip().lower()
    if _name in _NAMES:
        _flags |= _NAMES[_name]


def enable_flag(flag: int) -> None:
    """ccv_nnc_enable_flag twin."""
    global _flags
    _flags |= flag


def disable_flag(flag: int) -> None:
    """ccv_nnc_disable_flag twin."""
    global _flags
    _flags &= ~flag


def flags() -> int:
    """ccv_nnc_flags twin."""
    return _flags


def is_set(flag: int) -> bool:
    return bool(_flags & flag)
