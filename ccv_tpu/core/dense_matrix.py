"""DenseMatrix: the ccv-compatible image/matrix shell over ``jax.Array``.

Behavioral twin of ``ccv_dense_matrix_t`` (reference: lib/ccv.h:45-147,
lib/ccv_memory.c). The reference stores row-major interleaved-channel pixels
with a dtype tag and a 64-bit content *signature* used for transparent
memoization. Here the pixel payload is a ``jax.Array`` of shape
``(rows, cols, channels)`` living in HBM; the signature drives the host-side
op cache (see ``ccv_tpu.core.cache``).

Everything under ``jit`` works on the raw ``jax.Array``; DenseMatrix is a thin
host-edge wrapper, deliberately *not* a pytree: ops unwrap it at the boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ccv data type tags (lib/ccv.h:45-52), kept for API parity.
CCV_8U = 0x01000
CCV_32S = 0x02000
CCV_32F = 0x04000
CCV_64S = 0x08000
CCV_64F = 0x10000
CCV_16F = 0x20000
CCV_16BF = 0x80000

_CCV_TO_DTYPE = {
    CCV_8U: np.uint8,
    CCV_32S: np.int32,
    CCV_32F: np.float32,
    CCV_64S: np.int64,
    CCV_64F: np.float64,
    CCV_16F: np.float16,
    CCV_16BF: jnp.bfloat16,
}
_DTYPE_TO_CCV = {np.dtype(v).name: k for k, v in _CCV_TO_DTYPE.items()}


def ccv_type_to_dtype(type_tag: int) -> np.dtype:
    """Map a ccv type tag (possibly OR'd with a channel count) to a dtype."""
    data = type_tag & 0xFF000
    for tag, dt in _CCV_TO_DTYPE.items():
        if data & tag:
            return np.dtype(dt)
    raise ValueError(f"unknown ccv type tag {type_tag:#x}")


def ccv_type_channels(type_tag: int) -> int:
    """Channel count lives in the low 12 bits (lib/ccv.h CCV_GET_CHANNEL)."""
    return type_tag & 0xFFF


@dataclasses.dataclass
class DenseMatrix:
    """An image/matrix: ``array`` is (rows, cols) or (rows, cols, channels)."""

    array: jax.Array
    sig: int = 0  # 64-bit content signature; 0 = uncacheable

    @property
    def rows(self) -> int:
        return self.array.shape[0]

    @property
    def cols(self) -> int:
        return self.array.shape[1]

    @property
    def channels(self) -> int:
        return 1 if self.array.ndim == 2 else self.array.shape[2]

    @property
    def dtype(self):
        return self.array.dtype

    def numpy(self) -> np.ndarray:
        return np.asarray(self.array)

    def astype(self, dtype) -> "DenseMatrix":
        return DenseMatrix(self.array.astype(dtype), sig=0)

    def __repr__(self):
        return (f"DenseMatrix({self.rows}x{self.cols}x{self.channels} "
                f"{self.dtype} sig={self.sig:#x})")


def from_numpy(arr: np.ndarray, signed: bool = True) -> DenseMatrix:
    """Create a DenseMatrix from host data, computing its content signature."""
    from ccv_tpu.core import cache

    arr = np.ascontiguousarray(arr)
    sig = cache.generate_signature(arr.tobytes(), arr.shape, str(arr.dtype)) if signed else 0
    return DenseMatrix(jnp.asarray(arr), sig=sig)


def to_numpy(m) -> np.ndarray:
    if isinstance(m, DenseMatrix):
        return m.numpy()
    return np.asarray(m)


def as_array(m) -> jax.Array:
    """Unwrap DenseMatrix | ndarray | jax.Array to a jax.Array."""
    if isinstance(m, DenseMatrix):
        return m.array
    return jnp.asarray(m)


def convert_output(x: jax.Array, type_tag: Optional[int]) -> jax.Array:
    """Apply ccv output-type semantics: round+saturate to the tagged dtype.

    The reference's setter macros saturate on integer stores
    (lib/ccv_internal.h ccv_matrix_setter); float->int uses round-half-away.
    """
    if type_tag is None:
        return x
    dt = ccv_type_to_dtype(type_tag)
    if np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        x = jnp.clip(jnp.round(x), info.min, info.max)
    return x.astype(dt)
