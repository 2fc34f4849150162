"""Matrix utilities (reference: lib/ccv_util.c).

slice/border/shift/visualize/flatten + the sparse-matrix twin. The
reference's ccv_sparse_matrix_t (lib/ccv.h:104-145, lib/ccv_util.c — a
double-hash of per-row/column vector hashes) is re-expressed as Python
dict-of-dicts with the same API surface: row/column major, typed
multi-channel cells, get/set/vector access, FOREACH-style iteration, and
CSR compress/decompress (ccv_compress_sparse_matrix, lib/ccv.h:799). The
device-compute bridge is BCOO (sparse_to_bcoo); the hash internals
(prime-sized probing, ifbit tags) are storage strategy, not behavior,
and are not mirrored.
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


SPARSE_ROW_MAJOR = 0  # CCV_SPARSE_ROW_MAJOR (lib/ccv.h:120)
SPARSE_COL_MAJOR = 1  # CCV_SPARSE_COL_MAJOR


class SparseMatrix:
    """ccv_sparse_matrix_t twin (lib/ccv.h:125-144, lib/ccv_util.c).

    Cells are keyed (row, col); internally a per-major-axis vector index
    (dict-of-dicts) mirrors the reference's vector-hash layout so
    ``vector(i)`` / ``vector_foreach`` are O(vector) like
    ``ccv_get_sparse_matrix_vector`` (lib/ccv.h:763). ``dtype`` and
    ``channels`` play the role of the CCV type tag; multi-channel cells
    are stored as length-``channels`` numpy arrays.
    """

    def __init__(self, rows: int, cols: int, dtype=np.float32,
                 channels: int = 1, major: int = SPARSE_ROW_MAJOR):
        self.rows = rows
        self.cols = cols
        self.dtype = np.dtype(dtype)
        self.channels = channels
        self.major = major
        self.data: Dict[Tuple[int, int], object] = {}
        self._vec: Dict[int, Dict[int, object]] = {}

    # -- cell access (ccv_set/get_sparse_matrix_cell, lib/ccv.h:777-793) --
    def _coerce(self, value):
        if self.channels == 1:
            return self.dtype.type(value)
        v = np.asarray(value, self.dtype)
        assert v.shape == (self.channels,), v.shape
        return v

    def set(self, i: int, j: int, value):
        assert 0 <= i < self.rows and 0 <= j < self.cols, (i, j)
        value = self._coerce(value)
        self.data[(i, j)] = value
        mi, mj = (j, i) if self.major == SPARSE_COL_MAJOR else (i, j)
        self._vec.setdefault(mi, {})[mj] = value

    def get(self, i: int, j: int, default=0.0):
        return self.data.get((i, j), default)

    def __contains__(self, ij) -> bool:
        return tuple(ij) in self.data

    @property
    def rnum(self) -> int:
        """Number of assigned cells (the reference's mat->rnum)."""
        return len(self.data)

    # -- vector access (ccv_get_sparse_matrix_vector) ----------------------
    def vector(self, index: int) -> Dict[int, object]:
        """All assigned cells of one major-axis vector: {minor: value}.
        Empty dict when nothing was assigned (the reference returns a
        vector with size 0)."""
        return dict(self._vec.get(index, {}))

    def vector_foreach(self, index: int):
        """CCV_SPARSE_VECTOR_FOREACH twin: (minor_index, value) pairs."""
        return iter(sorted(self._vec.get(index, {}).items()))

    def foreach(self):
        """CCV_SPARSE_FOREACH twin: ((row, col), value) in major order."""
        if self.major == SPARSE_COL_MAJOR:
            return iter(sorted(self.data.items(),
                               key=lambda kv: (kv[0][1], kv[0][0])))
        return iter(sorted(self.data.items()))

    # -- dense bridges ------------------------------------------------------
    def to_dense(self) -> np.ndarray:
        shape = ((self.rows, self.cols) if self.channels == 1
                 else (self.rows, self.cols, self.channels))
        out = np.zeros(shape, self.dtype)
        for (i, j), v in self.data.items():
            out[i, j] = v
        return out

    @classmethod
    def from_dense(cls, arr, major: int = SPARSE_ROW_MAJOR) -> "SparseMatrix":
        arr = np.asarray(arr)
        channels = arr.shape[2] if arr.ndim == 3 else 1
        sm = cls(arr.shape[0], arr.shape[1], dtype=arr.dtype,
                 channels=channels, major=major)
        nz = np.nonzero(arr if arr.ndim == 2 else arr.any(axis=2))
        for i, j in zip(*nz):
            sm.set(int(i), int(j), arr[i, j])
        return sm

    # -- CSR compression (ccv_compress_sparse_matrix, ccv.h:799) -----------
    def compress(self) -> "CompressedSparseMatrix":
        """CSR for row-major, CSC for column-major (the reference
        compresses along the major axis)."""
        n_major = self.cols if self.major == SPARSE_COL_MAJOR else self.rows
        index, values = [], []
        offset = [0]
        for mi in range(n_major):
            for mj, v in sorted(self._vec.get(mi, {}).items()):
                index.append(mj)
                values.append(v)
            offset.append(len(index))
        data = (np.asarray(values, self.dtype) if self.channels == 1
                else (np.stack(values).astype(self.dtype) if values
                      else np.zeros((0, self.channels), self.dtype)))
        return CompressedSparseMatrix(
            nnz=len(index), rows=self.rows, cols=self.cols,
            major=self.major, channels=self.channels,
            index=np.asarray(index, np.int32),
            offset=np.asarray(offset, np.int32), data=data)


@dataclasses.dataclass
class CompressedSparseMatrix:
    """ccv_compressed_sparse_matrix_t twin (lib/ccv.h:244-255): CSR/CSC
    arrays — per-cell minor `index`, per-vector `offset` (length
    n_major + 1), `data`."""

    nnz: int
    rows: int
    cols: int
    major: int
    channels: int
    index: np.ndarray
    offset: np.ndarray
    data: np.ndarray

    def decompress(self) -> SparseMatrix:
        """ccv_decompress_sparse_matrix twin (lib/ccv.h:805)."""
        sm = SparseMatrix(self.rows, self.cols, dtype=self.data.dtype,
                          channels=self.channels, major=self.major)
        for mi in range(len(self.offset) - 1):
            for p in range(self.offset[mi], self.offset[mi + 1]):
                mj = int(self.index[p])
                i, j = ((mj, mi) if self.major == SPARSE_COL_MAJOR
                        else (mi, mj))
                sm.set(i, j, self.data[p])
        return sm


def compress_symmetric(sm: SparseMatrix) -> SparseMatrix:
    """Lower-triangle fold for symmetric relations (the reference keeps
    symmetric interference edges once)."""
    out = SparseMatrix(sm.rows, sm.cols, dtype=sm.dtype,
                       channels=sm.channels, major=sm.major)
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

    assert sp.channels == 1, "BCOO bridge is single-channel"
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
            sp.set(int(i), int(j), v)
    return sp
