"""Matrix utilities (reference: lib/ccv_util.c).

slice/border/shift/visualize/flatten + the sparse-matrix equivalent. On TPU
the reference's double-hash sparse matrix (used mainly as the compiler's
interference structure) maps to plain COO arrays; only the API surface that
detectors/tests use is provided here.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def slice_(a, y: int, x: int, rows: int, cols: int):
    """ccv_slice twin: crop with zero padding for out-of-bound regions."""
    H, W = a.shape[0], a.shape[1]
    out_shape = (rows, cols) + a.shape[2:]
    out = jnp.zeros(out_shape, a.dtype)
    sy0, sx0 = max(y, 0), max(x, 0)
    sy1, sx1 = min(y + rows, H), min(x + cols, W)
    if sy1 <= sy0 or sx1 <= sx0:
        return out
    region = a[sy0:sy1, sx0:sx1]
    return out.at[sy0 - y:sy1 - y, sx0 - x:sx1 - x].set(region)


def border(a, margin: Tuple[int, int, int, int]):
    """ccv_border twin: zero-pad by (left, top, right, bottom)."""
    left, top, right, bottom = margin
    pads = [(top, bottom), (left, right)] + [(0, 0)] * (a.ndim - 2)
    return jnp.pad(a, pads)


def shift(a, lshift: int = 0):
    """ccv_shift twin: dtype conversion with bit shift semantics."""
    if lshift >= 0:
        return a.astype(jnp.int32) << lshift
    return a.astype(jnp.int32) >> (-lshift)


def flatten(a):
    """ccv_flatten twin: sum over channels to single channel (int)."""
    if a.ndim == 2:
        return a.astype(jnp.int32)
    return jnp.sum(a.astype(jnp.int32), axis=-1)


def any_nan(a) -> bool:
    """ccv_any_nan twin."""
    return bool(jnp.any(jnp.isnan(a.astype(jnp.float32))))


def visualize(a):
    """ccv_visualize twin: normalize any matrix into a viewable u8 image."""
    x = a.astype(jnp.float32)
    lo = jnp.min(x)
    hi = jnp.max(x)
    out = (x - lo) / jnp.maximum(hi - lo, 1e-12) * 255.0
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def zero(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


@dataclasses.dataclass
class SparseMatrix:
    """ccv_sparse_matrix_t stand-in: COO with a dict index (host-side).

    The reference uses it for the allocator's interference graph; here it
    backs ccv-compat APIs and tests."""

    rows: int
    cols: int
    data: Dict[Tuple[int, int], float] = dataclasses.field(default_factory=dict)

    def set(self, i: int, j: int, value):
        self.data[(i, j)] = value

    def get(self, i: int, j: int, default=0.0):
        return self.data.get((i, j), default)

    def foreach(self):
        return iter(sorted(self.data.items()))

    def to_dense(self) -> np.ndarray:
        out = np.zeros((self.rows, self.cols), np.float32)
        for (i, j), v in self.data.items():
            out[i, j] = v
        return out

    @classmethod
    def from_dense(cls, arr) -> "SparseMatrix":
        arr = np.asarray(arr)
        sm = cls(arr.shape[0], arr.shape[1])
        for i, j in zip(*np.nonzero(arr)):
            sm.set(int(i), int(j), float(arr[i, j]))
        return sm


def compress_symmetric(sm: SparseMatrix) -> SparseMatrix:
    """ccv_compress_sparse_matrix spirit: keep lower triangle."""
    out = SparseMatrix(sm.rows, sm.cols)
    for (i, j), v in sm.data.items():
        if i >= j:
            out.set(i, j, v)
    return out


# ---------------------------------------------------------------------------
# BCOO sparse matrix (device-native; the COO dict above is the host-side
# builder, this is the compute representation)
# ---------------------------------------------------------------------------

def sparse_to_bcoo(sp):
    """SparseMatrix -> jax.experimental.sparse.BCOO for device compute
    (matmuls against dense operands lower to XLA gather/scatter)."""
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse

    items = sorted(sp.data.items())
    if not items:
        idx = jnp.zeros((0, 2), jnp.int32)
        data = jnp.zeros((0,), jnp.float32)
    else:
        idx = jnp.asarray([[i, j] for (i, j), _ in items], jnp.int32)
        data = jnp.asarray([v for _, v in items], jnp.float32)
    return jsparse.BCOO((data, idx), shape=(sp.rows, sp.cols))


def bcoo_to_sparse(mat):
    """BCOO -> SparseMatrix (host)."""
    import numpy as np

    sp = SparseMatrix(int(mat.shape[0]), int(mat.shape[1]))
    idx = np.asarray(mat.indices)
    data = np.asarray(mat.data)
    for (i, j), v in zip(idx.tolist(), data.tolist()):
        if v != 0:
            sp.data[(int(i), int(j))] = v
    return sp
