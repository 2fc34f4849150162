"""Core layer tests: DenseMatrix, signature cache semantics, CCVBINDM I/O.

Twin of reference test/unit/memory.tests.c (cache hit/miss/LRU-out) and
io round-trips.
"""

import numpy as np
import pytest

from ccv_tpu import compat as ccv
from ccv_tpu.core import cache
from ccv_tpu.core.dense_matrix import DenseMatrix, from_numpy
from ccv_tpu.core.io import read, write_ccv_binary


@pytest.fixture(autouse=True)
def fresh_cache():
    cache.disable()
    yield
    cache.disable()


def test_signature_determinism():
    a = from_numpy(np.arange(12, dtype=np.uint8).reshape(3, 4))
    b = from_numpy(np.arange(12, dtype=np.uint8).reshape(3, 4))
    c = from_numpy(np.arange(12, dtype=np.int32).reshape(3, 4))
    assert a.sig == b.sig != 0
    assert a.sig != c.sig  # dtype participates in the signature


def test_cache_hit_returns_same_result():
    cache.enable()
    img = from_numpy((np.arange(900) % 251).astype(np.uint8).reshape(30, 30))
    out1 = ccv.ccv_sobel(img, dx=1, dy=0)
    h0, m0 = cache.hits, cache.misses
    out2 = ccv.ccv_sobel(img, dx=1, dy=0)
    assert cache.hits == h0 + 1
    assert out1.sig == out2.sig != 0
    np.testing.assert_array_equal(out1.numpy(), out2.numpy())
    # different params -> different signature, no false hit
    out3 = ccv.ccv_sobel(img, dx=0, dy=1)
    assert out3.sig != out1.sig


def test_cache_disabled_no_memoization():
    img = from_numpy(np.zeros((8, 8), np.uint8))
    h0 = cache.hits
    ccv.ccv_sobel(img, dx=1, dy=0)
    ccv.ccv_sobel(img, dx=1, dy=0)
    assert cache.hits == h0


def test_cache_lru_eviction():
    cache.enable(max_bytes=5000)  # tiny: fits one 32x32 int32 output at most
    img1 = from_numpy(np.ones((32, 32), np.uint8))
    img2 = from_numpy(np.full((32, 32), 2, np.uint8))
    ccv.ccv_sobel(img1, dx=1, dy=0)
    ccv.ccv_sobel(img2, dx=1, dy=0)  # evicts img1's entry
    h0 = cache.hits
    ccv.ccv_sobel(img1, dx=1, dy=0)
    assert cache.hits == h0  # miss: was evicted


def test_derived_signature_zero_propagates():
    assert cache.derive_signature("op", (), (0,)) == 0
    assert cache.derive_signature("op", (), (123,)) != 0


def test_ccvbindm_roundtrip(tmp_path):
    for arr in [
        np.arange(35, dtype=np.uint8).reshape(5, 7),
        np.arange(60, dtype=np.int32).reshape(4, 5, 3),
        np.linspace(0, 1, 24, dtype=np.float32).reshape(4, 6),
    ]:
        p = str(tmp_path / "m.bin")
        write_ccv_binary(from_numpy(arr), p)
        back = read(p).numpy()
        np.testing.assert_array_equal(back, arr)


def test_uint8_odd_width_step_padding(tmp_path):
    # rows whose byte width isn't 4-aligned exercise the step padding
    arr = (np.arange(15, dtype=np.uint8)).reshape(3, 5)
    p = str(tmp_path / "odd.bin")
    write_ccv_binary(from_numpy(arr), p)
    np.testing.assert_array_equal(read(p).numpy(), arr)


def test_numeric_linear_algebra():
    """ccv_invert / ccv_solve / ccv_eigen twins."""
    import numpy as np

    from ccv_tpu.core import numeric

    rng = np.random.default_rng(0)
    a = rng.standard_normal((5, 5)).astype(np.float32)
    a = a @ a.T + 5 * np.eye(5, dtype=np.float32)  # SPD
    inv = np.asarray(numeric.invert(a))
    np.testing.assert_allclose(inv @ a, np.eye(5), atol=1e-4)
    b = rng.standard_normal((5, 2)).astype(np.float32)
    x = np.asarray(numeric.solve(a, b))
    np.testing.assert_allclose(a @ x, b, atol=1e-3)
    vec, lam = map(np.asarray, numeric.eigen(a))
    assert (np.diff(lam) <= 1e-5).all()  # descending
    for i in range(5):
        np.testing.assert_allclose(a @ vec[i], lam[i] * vec[i], atol=1e-3)


def test_sparse_bcoo_roundtrip():
    """SparseMatrix <-> BCOO and a device sparse-dense matmul."""
    import numpy as np

    from ccv_tpu.core.util import SparseMatrix, bcoo_to_sparse, sparse_to_bcoo

    sp = SparseMatrix(4, 5)
    sp.set(0, 1, 2.0)
    sp.set(3, 4, -1.5)
    sp.set(2, 2, 7.0)
    m = sparse_to_bcoo(sp)
    dense = np.zeros((4, 5), np.float32)
    dense[0, 1], dense[3, 4], dense[2, 2] = 2.0, -1.5, 7.0
    x = np.arange(5, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(m @ x), dense @ x)
    back = bcoo_to_sparse(m)
    assert back.data == sp.data
