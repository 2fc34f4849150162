"""Sparse matrix twin: mirrors the reference's sparse unit cases
(test/unit/util.tests.c:108-230)."""

import numpy as np

from ccv_tpu.core import util
from ccv_tpu.core.util import (SPARSE_COL_MAJOR, SPARSE_ROW_MAJOR,
                               SparseMatrix)


def test_specific_insertion_int():
    """util.tests.c:108 'specific sparse matrix insertion'."""
    mat = SparseMatrix(1, 70, dtype=np.int32)
    idx = [26, 37, 51, 69]
    for k, j in enumerate(idx):
        mat.set(0, j, k + 1)
    for k, j in enumerate(idx):
        assert mat.get(0, j) == k + 1
    assert mat.rnum == 4


def test_basic_insertion_1000():
    """util.tests.c:125 'sparse matrix basic insertion' (stride walk)."""
    mat = SparseMatrix(1000, 1000, dtype=np.int32)
    k = 0
    for i in range(200):
        for j in range(300):
            mat.set(i * 5 % 1000, j * 3 % 1000, k)
            k += 1
    # same overwrite pattern as the reference: last write wins
    k = 0
    seen = {}
    for i in range(200):
        for j in range(300):
            seen[(i * 5 % 1000, j * 3 % 1000)] = k
            k += 1
    for (i, j), v in seen.items():
        assert mat.get(i, j) == v
    assert mat.rnum == len(seen)


def test_compress_decompress_csr():
    """util.tests.c:152 'compress sparse matrix' — exact CSR arrays."""
    mat = SparseMatrix(3, 3, dtype=np.float32)
    for (i, j), v in (((0, 0), 1.0), ((0, 2), 2.0), ((1, 2), 3.0),
                      ((2, 0), 4.0), ((2, 1), 5.0), ((2, 2), 6.0)):
        mat.set(i, j, v)
    csm = mat.compress()
    assert csm.nnz == 6
    np.testing.assert_allclose(csm.data, [1, 2, 3, 4, 5, 6])
    np.testing.assert_array_equal(csm.index, [0, 2, 2, 0, 1, 2])
    assert csm.rows == 3
    np.testing.assert_array_equal(csm.offset, [0, 2, 3, 6])
    smt = csm.decompress()
    m = np.array([[1, 0, 2], [0, 0, 3], [4, 5, 6]], np.float32)
    for i in range(3):
        for j in range(3):
            assert smt.get(i, j) == m[i, j]


def test_loop_matches_dense():
    """util.tests.c:194 'loop over sparse matrix': FOREACH visits exactly
    the assigned cells with their values."""
    rng = np.random.default_rng(0)
    dense = np.zeros((100, 100), np.float32)
    mat = SparseMatrix(100, 100)
    for _ in range(200):
        i, j = rng.integers(0, 100, 2)
        v = rng.standard_normal()
        dense[i, j] = v
        mat.set(int(i), int(j), float(v))
    got = {k: float(v) for k, v in mat.foreach()}
    want = {(int(i), int(j)): float(dense[i, j])
            for i, j in zip(*np.nonzero(dense))}
    assert got == want


def test_column_major_vectors():
    mat = SparseMatrix(4, 3, major=SPARSE_COL_MAJOR)
    mat.set(0, 1, 1.0)
    mat.set(2, 1, 2.0)
    mat.set(3, 0, 3.0)
    # vector(index) walks the major axis = columns
    assert mat.vector(1) == {0: 1.0, 2: 2.0}
    assert list(mat.vector_foreach(0)) == [(3, 3.0)]
    # CSC: offsets per column
    csm = mat.compress()
    np.testing.assert_array_equal(csm.offset, [0, 1, 3, 3])
    np.testing.assert_array_equal(csm.index, [3, 0, 2])
    round_trip = csm.decompress()
    np.testing.assert_array_equal(round_trip.to_dense(), mat.to_dense())


def test_multichannel_cells():
    mat = SparseMatrix(5, 5, dtype=np.float32, channels=3)
    mat.set(1, 2, [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(mat.get(1, 2), [1, 2, 3])
    d = mat.to_dense()
    assert d.shape == (5, 5, 3)
    back = SparseMatrix.from_dense(d)
    assert back.channels == 3
    np.testing.assert_array_equal(back.get(1, 2), [1, 2, 3])
    csm = mat.compress()
    rt = csm.decompress()
    np.testing.assert_array_equal(rt.get(1, 2), [1, 2, 3])


def test_row_vector_foreach_and_contains():
    mat = SparseMatrix(10, 10)
    mat.set(3, 7, 1.5)
    mat.set(3, 2, 2.5)
    assert list(mat.vector_foreach(3)) == [(2, 2.5), (7, 1.5)]
    assert (3, 7) in mat and (7, 3) not in mat
