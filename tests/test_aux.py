"""Aux subsystem tests: native runtime, dataframe pipeline, util, logging."""

from conftest import reference_path
import os

import numpy as np
import pytest

from ccv_tpu.core import util
from ccv_tpu.nn.dataframe import Dataframe
from ccv_tpu.utils import log


class TestNative:
    def test_siphash_and_lru(self):
        from ccv_tpu.core import native

        if native.load() is None:
            pytest.skip("native library not built")
        h1 = native.siphash24(b"abc")
        h2 = native.siphash24(b"abc")
        h3 = native.siphash24(b"abd")
        assert h1 == h2 != h3
        lru = native.NativeLru(100)
        assert lru.put(1, b"hello")
        assert lru.get(1) == b"hello"
        assert lru.get(2) is None
        lru.put(2, b"x" * 96)  # evicts 1
        assert lru.get(1) is None
        assert lru.delete(2)
        assert lru.used_bytes == 0

    def test_native_decode_matches_pil(self):
        from ccv_tpu.core import native
        from PIL import Image

        if native.load() is None or not os.path.exists(
                reference_path("samples/nature.png")):
            pytest.skip("native library or samples not available")
        r = native.decode_image(reference_path("samples/nature.png"))
        assert r is not None
        arr, ch = r
        pil = np.asarray(Image.open(reference_path("samples/nature.png")).convert("RGB"))
        np.testing.assert_array_equal(arr, pil)


class TestDataframe:
    def test_map_batch_shuffle(self):
        df = Dataframe.from_arrays(
            x=np.arange(10, dtype=np.float32),
            y=np.arange(10, dtype=np.int32) % 3)
        df.map("x2", lambda v: v * 2, ["x"])
        df.one_hot("yh", "y", 3)
        batches = list(df.batch(["x2", "yh"], 4))
        assert len(batches) == 2  # drop remainder
        np.testing.assert_array_equal(batches[0][0], [0, 2, 4, 6])
        assert batches[0][1].shape == (4, 3)
        df.shuffle(seed=0)
        b2 = list(df.batch(["x"], 10))
        assert sorted(b2[0][0].tolist()) == list(range(10))

    def test_csv(self, tmp_path):
        p = tmp_path / "d.csv"
        p.write_text("a,b\n1,x\n2,y\n3,z\n")
        df = Dataframe.from_csv(str(p))
        assert df.n == 3
        assert df.row(1, ["a", "b"]) == ("2", "y")

    def test_prefetch_iter(self):
        df = Dataframe.from_arrays(x=np.arange(8, dtype=np.float32))
        out = [b[0] for b in df.iter(["x"], 4, prefetch=2, device_put=False)]
        assert len(out) == 2
        np.testing.assert_array_equal(np.concatenate(out), np.arange(8))

    def test_csv_vectorized_paths(self, tmp_path):
        # crlf + no-header + numeric column through the two-pass parser
        p = tmp_path / "v.csv"
        p.write_bytes(b"1,2.5,foo\r\n4,5.5,bar\r\n7,8.5,baz\r\n")
        df = Dataframe.from_csv(str(p), header=False)
        assert df.n == 3
        assert df.row(2, ["0", "1", "2"]) == ("7", "8.5", "baz")
        col = df._columns["1"]
        np.testing.assert_allclose(col.numeric(), [2.5, 5.5, 8.5])
        # quoted fields (delimiter inside quotes) -> state-machine path
        q = tmp_path / "q.csv"
        q.write_text('a,b\n"x,1",2\n"y",4\n')
        dq = Dataframe.from_csv(str(q))
        assert dq.n == 2 and dq.row(0, ["a", "b"]) == ("x,1", "2")
        # ragged rows -> state-machine fallback
        r = tmp_path / "r.csv"
        r.write_text("a,b\n1\n2,3\n")
        dr = Dataframe.from_csv(str(r))
        assert dr.n == 2 and dr.row(0, ["a", "b"]) == ("1", "")
        # missing trailing newline
        t = tmp_path / "t.csv"
        t.write_bytes(b"a,b\n1,2")
        dt = Dataframe.from_csv(str(t))
        assert dt.n == 1 and dt.row(0, ["a", "b"]) == ("1", "2")

    def test_batch_thread_pool(self):
        df = Dataframe.from_arrays(x=np.arange(32, dtype=np.float32))
        df.map("x3", lambda v: v * 3, ["x"])
        got = list(df.batch(["x3"], 8, num_threads=4))
        np.testing.assert_array_equal(
            np.concatenate([b[0] for b in got]), np.arange(32) * 3)


class TestUtil:
    def test_slice_border(self):
        import jax.numpy as jnp

        a = jnp.arange(16, dtype=jnp.int32).reshape(4, 4)
        s = util.slice_(a, 1, 1, 2, 2)
        np.testing.assert_array_equal(np.asarray(s), [[5, 6], [9, 10]])
        # out-of-bounds region is zero-filled
        s2 = util.slice_(a, -1, -1, 3, 3)
        assert np.asarray(s2)[0, 0] == 0
        assert np.asarray(s2)[1, 1] == 0 + a[0, 0]
        b = util.border(a, (1, 2, 3, 4))
        assert b.shape == (4 + 2 + 4, 4 + 1 + 3)
        assert np.asarray(b)[2, 1] == 0  # wait: [top]=2 rows pad; origin at (2,1)

    def test_visualize_range(self):
        import jax.numpy as jnp

        v = util.visualize(jnp.asarray([[-5.0, 0.0, 5.0]]))
        assert int(v[0, 0]) == 0 and int(v[0, 2]) == 255

    def test_sparse_roundtrip(self):
        dense = np.zeros((3, 4), np.float32)
        dense[1, 2] = 7
        sm = util.SparseMatrix.from_dense(dense)
        assert sm.get(1, 2) == 7 and sm.get(0, 0) == 0
        np.testing.assert_array_equal(sm.to_dense(), dense)


class TestLog:
    def test_levels(self, capsys):
        log.set_output_levels(log.output_level_and_above(log.CCV_CLI_INFO))
        log.cli_print(log.CCV_CLI_INFO, "info %d", 42)
        log.cli_print(log.CCV_CLI_VERBOSE, "hidden")
        out = capsys.readouterr()
        assert "info 42" in out.out
        assert "hidden" not in out.out


def test_dataframe_remaining_addons():
    """one_squared / copy_scalar / sample / truncate / combine /
    make_tuple / extract_tuple twins."""
    import numpy as np

    from ccv_tpu.nn.dataframe import Dataframe

    df = Dataframe.from_arrays(x=np.arange(10), y=np.arange(10) * 2)
    df.one_squared("seq", "x", max_length=3)
    df.copy_scalar("k", 7)
    df.make_tuple("t", ["x", "y"])
    df.extract_tuple("y2", "t", 1)
    row = df.row(4, ["seq", "k", "y2"])
    assert row[0].shape == (3,) and row[1] == 7 and row[2] == 8
    tr = df.truncate(4)
    assert tr.n == 4
    sm = df.sample(5, seed=0)
    assert sm.n == 5
    both = tr.combine(tr)
    assert both.n == 8
    xs = [both.row(i, ["x"])[0] for i in range(8)]
    assert xs[:4] == xs[4:]
