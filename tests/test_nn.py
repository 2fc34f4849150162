"""NN stack tests: ops vs numpy oracles, model fit convergence, optimizer
semantics, data-parallel equivalence on the 8-device CPU mesh, checkpoint
round-trips, palettize round-trips.

Mirrors the reference's test strategy: cpu_ref is the oracle for every
accelerated path (test/int/nnc pattern), training convergence smoke tests
(test/unit/nnc/cnnp.core.tests.c).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccv_tpu.nn import ops, layers as L, optimizers as opt
from ccv_tpu.nn.model import Sequential
from ccv_tpu import parallel as par


class TestOps:
    def test_conv2d_vs_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 8, 8, 3), np.float32)
        w = rng.standard_normal((4, 3, 3, 3), np.float32)
        out = np.asarray(ops.conv2d(jnp.asarray(x), jnp.asarray(w), padding="VALID"))
        ref = np.zeros((1, 6, 6, 4), np.float32)
        for o in range(4):
            for i in range(6):
                for j in range(6):
                    ref[0, i, j, o] = np.sum(x[0, i:i+3, j:j+3, :] * w[o].transpose(0, 1, 2))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_softmax_crossentropy_stable(self):
        logits = jnp.array([[1000.0, 0.0, -1000.0]])
        loss, sm = ops.softmax_crossentropy(logits, jnp.array([0]))
        assert float(loss[0]) == 0.0
        np.testing.assert_allclose(np.asarray(sm[0, 0]), 1.0)

    def test_pool(self):
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        mx = ops.max_pool(x, (2, 2))
        av = ops.avg_pool(x, (2, 2))
        np.testing.assert_array_equal(np.asarray(mx)[0, :, :, 0], [[5, 7], [13, 15]])
        np.testing.assert_allclose(np.asarray(av)[0, :, :, 0], [[2.5, 4.5], [10.5, 12.5]])

    def test_layer_norm(self):
        x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 16), np.float32))
        y = np.asarray(ops.layer_norm(x))
        np.testing.assert_allclose(y.mean(-1), 0, atol=1e-5)
        np.testing.assert_allclose(y.var(-1), 1, atol=1e-3)

    def test_attention_matches_naive(self):
        rng = np.random.default_rng(2)
        q = rng.standard_normal((2, 5, 3, 8), np.float32)
        k = rng.standard_normal((2, 5, 3, 8), np.float32)
        v = rng.standard_normal((2, 5, 3, 8), np.float32)
        out = np.asarray(ops.scaled_dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        scale = 1 / np.sqrt(8)
        for b in range(2):
            for h in range(3):
                logits = q[b, :, h] @ k[b, :, h].T * scale
                p = np.exp(logits - logits.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                np.testing.assert_allclose(out[b, :, h], p @ v[b, :, h],
                                           rtol=1e-4, atol=1e-5)

    def test_nms(self):
        boxes = jnp.array([[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 5, 5]],
                          jnp.float32)
        scores = jnp.array([0.9, 0.8, 0.7])
        order, keep = ops.nms(boxes, scores, 0.5)
        kept = set(np.asarray(order)[np.asarray(keep)].tolist())
        assert kept == {0, 2}

    def test_lstm_shapes(self):
        x = jnp.zeros((7, 2, 4))
        w_ih = jnp.zeros((4, 32))
        w_hh = jnp.zeros((8, 32))
        ys, h, c = ops.lstm(x, w_ih, w_hh)
        assert ys.shape == (7, 2, 8) and h.shape == (2, 8)


class TestOptimizers:
    def test_sgd_momentum(self):
        o = opt.sgd(rate=0.1, momentum=0.9, dampening=0.0)
        params = {"w": jnp.array([1.0])}
        state = o.init(params)
        grads = {"w": jnp.array([1.0])}
        p1, s1 = o.update(grads, state, params)
        np.testing.assert_allclose(np.asarray(p1["w"]), [1.0 - 0.1])
        p2, s2 = o.update(grads, s1, p1)
        # m2 = 0.9*1 + 1 = 1.9 -> p2 = 0.9 - 0.19
        np.testing.assert_allclose(np.asarray(p2["w"]), [0.9 - 0.19], rtol=1e-6)

    def test_adam_step(self):
        o = opt.adam(rate=0.001)
        params = {"w": jnp.array([0.0])}
        state = o.init(params)
        grads = {"w": jnp.array([1.0])}
        p1, _ = o.update(grads, state, params)
        # first step of adam moves by ~rate regardless of grad scale
        np.testing.assert_allclose(np.asarray(p1["w"]), [-0.001], rtol=1e-3)

    def test_clip_grad_norm(self):
        grads = {"a": jnp.array([3.0]), "b": jnp.array([4.0])}
        clipped, norm = opt.clip_grad_norm(grads, 1.0)
        assert abs(float(norm) - 5.0) < 1e-6
        total = np.sqrt(float(clipped["a"][0]) ** 2 + float(clipped["b"][0]) ** 2)
        assert abs(total - 1.0) < 1e-5


class TestModel:
    def _toy(self):
        return Sequential([
            L.Dense(16, name="d1"), L.ReLU(),
            L.Dense(2, name="d2"),
        ])

    def test_fit_decreases_loss(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((64, 8), np.float32))
        y = jnp.asarray((rng.standard_normal(64) > 0).astype(np.int32))
        m = self._toy()
        m.build((64, 8))
        m.compile(opt.sgd(rate=0.1, momentum=0.9), "softmax_crossentropy")
        losses = [m.fit(x, y) for _ in range(20)]
        assert losses[-1] < losses[0] * 0.9

    def test_backward_apply_equals_fit(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((16, 8), np.float32))
        y = jnp.asarray((rng.standard_normal(16) > 0).astype(np.int32))
        m1, m2 = self._toy(), self._toy()
        for m in (m1, m2):
            m.build((16, 8), key=jax.random.PRNGKey(7))
            m.compile(opt.sgd(rate=0.1, momentum=0.0), "softmax_crossentropy")
        m1.fit(x, y)
        m2.backward(x, y)
        m2.apply_gradients()
        for p1, p2 in zip(jax.tree_util.tree_leaves(m1.params),
                          jax.tree_util.tree_leaves(m2.params)):
            np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)

    def test_data_parallel_matches_single(self):
        if jax.device_count() < 4:
            pytest.skip("needs virtual devices")
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((32, 8), np.float32))
        y = jnp.asarray((rng.standard_normal(32) > 0).astype(np.int32))
        m1, m2 = self._toy(), self._toy()
        for m in (m1, m2):
            m.build((32, 8), key=jax.random.PRNGKey(3))
            m.compile(opt.sgd(rate=0.1, momentum=0.9), "softmax_crossentropy")
        m2.set_data_parallel(4)
        l1 = m1.fit(x, y)
        l2 = m2.fit(x, y)
        assert abs(l1 - l2) < 1e-4
        for p1, p2 in zip(jax.tree_util.tree_leaves(m1.params),
                          jax.tree_util.tree_leaves(m2.params)):
            np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                       rtol=1e-5, atol=1e-5)

    def test_gradient_checkpointing_same_result(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((8, 8), np.float32))
        y = jnp.asarray((rng.standard_normal(8) > 0).astype(np.int32))
        m1, m2 = self._toy(), self._toy()
        for m in (m1, m2):
            m.build((8, 8), key=jax.random.PRNGKey(5))
        m2.set_gradient_checkpointing(True)
        for m in (m1, m2):
            m.compile(opt.sgd(rate=0.1, momentum=0.0), "softmax_crossentropy")
        l1, l2 = m1.fit(x, y), m2.fit(x, y)
        assert abs(l1 - l2) < 1e-6

    def test_checkpoint_roundtrip(self, tmp_path):
        m1, m2 = self._toy(), self._toy()
        m1.build((4, 8), key=jax.random.PRNGKey(11))
        m2.build((4, 8), key=jax.random.PRNGKey(12))
        p = str(tmp_path / "model.sqlite3")
        m1.write(p)
        m2.read(p)
        for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                        jax.tree_util.tree_leaves(m2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTensorIO:
    def test_tensor_roundtrip(self, tmp_path):
        from ccv_tpu.nn import tensor_io

        p = str(tmp_path / "t.sqlite3")
        conn = tensor_io.open_db(p)
        arr = np.random.default_rng(0).standard_normal((3, 4, 5)).astype(np.float32)
        tensor_io.tensor_write(conn, "x", arr)
        conn.commit()
        back = tensor_io.tensor_read(conn, "x")
        np.testing.assert_array_equal(back, arr)
        assert tensor_io.list_tensors(conn) == ["x"]

    def test_encode_decode_hooks(self, tmp_path):
        """Pluggable encode/decode (ccv_nnc.h:674-699): an xor-'cipher'
        round trip, with identifier carried in the type high bits."""
        from ccv_tpu.nn import tensor_io

        def enc(name, data, tag, shape):
            return bytes(b ^ 0x5A for b in data), 0x77

        def dec(name, data, tag, shape, identifier):
            if identifier != 0x77:
                return None
            raw = bytes(b ^ 0x5A for b in data)
            return np.frombuffer(raw, tensor_io._np_dtype(tag)).reshape(shape)

        opts = tensor_io.TensorIoOptions(encode=enc, decode=dec)
        p = str(tmp_path / "t.sqlite3")
        conn = tensor_io.open_db(p)
        arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        tensor_io.tensor_write(conn, "x", arr, options=opts)
        conn.commit()
        # the stored bytes are ciphered, and the identifier is recorded
        blob, type_ = conn.execute(
            "SELECT data, type FROM tensors WHERE name='x'").fetchone()
        assert not np.array_equal(
            np.frombuffer(blob, np.float32).reshape(2, 3, 4), arr)
        assert (type_ >> 32) & 0xFFFFFFFF == 0x77
        back = tensor_io.tensor_read(conn, "x", options=opts)
        np.testing.assert_array_equal(back, arr)

    def test_external_store_mmap(self, tmp_path):
        """External-store hooks + zero-copy mmap read-back."""
        from ccv_tpu.nn import tensor_io

        p = str(tmp_path / "t.sqlite3")
        store = tensor_io.ExternalStore(str(tmp_path / "t.bin"))
        conn = tensor_io.open_db(p)
        a = np.arange(12, dtype=np.float32).reshape(3, 4)
        b = np.arange(6, dtype=np.float16).reshape(2, 3) * 0.5
        tensor_io.tensor_write(conn, "a", a, options=store.options())
        tensor_io.tensor_write(conn, "b", b, options=store.options())
        tensor_io.tensor_write(conn, "plain", a)  # raw row coexists
        conn.commit()
        back_a = tensor_io.tensor_read(conn, "a", options=store.options())
        back_b = tensor_io.tensor_read(conn, "b", options=store.options())
        np.testing.assert_array_equal(back_a, a)
        np.testing.assert_array_equal(back_b, b)
        assert isinstance(back_a.base, np.memmap) or isinstance(
            back_a, np.memmap)
        np.testing.assert_array_equal(
            tensor_io.tensor_read(conn, "plain", options=store.options()), a)
        # the sqlite rows carry only (offset, size)
        blob = conn.execute(
            "SELECT data FROM tensors WHERE name='a'").fetchone()[0]
        assert len(blob) == 16

    def test_tensor_new_from_file(self, tmp_path):
        from ccv_tpu.nn import tensor_io

        arr = np.random.default_rng(1).standard_normal((7, 5)).astype(np.float32)
        p = str(tmp_path / "raw.bin")
        arr.tofile(p)
        mm = tensor_io.tensor_new_from_file(p, np.float32, (7, 5))
        np.testing.assert_array_equal(np.asarray(mm), arr)
        mm2 = tensor_io.tensor_new_from_file(p, 0x04000, (35,))
        np.testing.assert_array_equal(np.asarray(mm2), arr.reshape(-1))


class TestPalettize:
    @pytest.mark.parametrize("qbits", [4, 5, 6, 7, 8])
    def test_roundtrip_exact_for_few_values(self, qbits):
        from ccv_tpu.nn import palettize

        rng = np.random.default_rng(0)
        # data drawn from exactly 2^qbits distinct values -> lossless
        values = rng.standard_normal(1 << qbits).astype(np.float32)
        arr = values[rng.integers(0, 1 << qbits, 1000)]
        enc = palettize.palettize(arr, qbits, number_in_blocks=512)
        dec = palettize.depalettize(enc, 0x04000, 1000, qbits, 512)
        np.testing.assert_allclose(dec, arr, atol=1e-6)

    def test_kmeans1d_optimal(self):
        from ccv_tpu.core.numeric import kmeans1d

        data = np.array([0.0, 0.1, 0.2, 10.0, 10.1, 20.0])
        clusters, centroids = kmeans1d(data, 3)
        assert len(set(clusters[:3])) == 1
        assert len(set(clusters[3:5])) == 1
        assert clusters[5] != clusters[0] and clusters[5] != clusters[3]
        np.testing.assert_allclose(sorted(centroids), [0.1, 10.05, 20.0],
                                   atol=1e-9)


class TestParallel:
    def test_comm_collectives(self):
        if jax.device_count() < 4:
            pytest.skip("needs virtual devices")
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        mesh = par.make_mesh({"data": 4})
        x = jnp.arange(4, dtype=jnp.float32)

        def body(v):
            return (par.comm_allreduce(v, "data"),
                    par.comm_broadcast(v, "data", root=2))

        f = shard_map(body, mesh=mesh, in_specs=P("data"), out_specs=P("data"))
        s, b = f(x)
        np.testing.assert_allclose(np.asarray(s), [6.0] * 4)
        np.testing.assert_allclose(np.asarray(b), [2.0] * 4)


def test_trainer_checkpoint_resume_exact_trajectory(tmp_path):
    """checkpoint()/resume() persist optimizer state + RNG: resuming
    reproduces the exact continued training trajectory (beyond the
    reference, whose model_write keeps only parameters/internals)."""
    import jax.numpy as jnp

    from ccv_tpu.nn import layers as L, optimizers
    from ccv_tpu.nn.model import Sequential

    def make():
        m = Sequential([L.Dense(16, name="d1"), L.ReLU(),
                        L.BatchNorm(name="bn"), L.Dense(3, name="d2")],
                       name="ckpt")
        m.build((8, 6))
        m.compile(optimizers.adam(rate=1e-2), "softmax_crossentropy")
        return m

    rng = np.random.default_rng(0)
    X = rng.standard_normal((8, 6), np.float32)
    Y = rng.integers(0, 3, (8,))
    m = make()
    for _ in range(3):
        m.fit(X, Y)
    p = str(tmp_path / "trainer.sqlite3")
    m.checkpoint(p)
    cont = [m.fit(X, Y) for _ in range(3)]

    m2 = make()
    m2.resume(p)
    resumed = [m2.fit(X, Y) for _ in range(3)]
    np.testing.assert_allclose(resumed, cont, rtol=1e-5)


def test_cmd_registry_introspection():
    """ccv_nnc_cmd registry twin: name/id resolution, dispatch, attrs."""
    import jax.numpy as jnp

    from ccv_tpu.nn import cmd as C

    assert C.CMD_COUNT >= 60
    e = C.cmd_entry("CCV_NNC_GEMM_FORWARD")
    assert C.cmd_name(e.id) == "CCV_NNC_GEMM_FORWARD"
    a = jnp.ones((2, 3))
    b = jnp.ones((3, 4))
    out = C.cmd("CCV_NNC_GEMM_FORWARD")(a, b)
    assert out.shape == (2, 4)
    assert C.cmd_ok("CCV_NNC_RELU_FORWARD")
    assert not C.cmd_ok("CCV_NNC_NOT_A_CMD")
    assert C.cmd_attr("CCV_NNC_NOOP_FORWARD", C.CMD_ATTR_PASSTHROUGH)
    assert not C.cmd_attr("CCV_NNC_RELU_FORWARD", C.CMD_ATTR_PASSTHROUGH)
    names = {e.name for e in C.commands()}
    assert "CCV_NNC_SCALED_DOT_PRODUCT_ATTENTION_FORWARD" in names


def test_model_cancel_is_one_shot():
    """ccv_cnnp_model_cancel twin: the next queued step is skipped
    (params/opt state untouched), then training resumes."""
    from ccv_tpu.nn import layers as L
    from ccv_tpu.nn import optimizers
    from ccv_tpu.nn.model import Sequential

    m = Sequential([L.Dense(4), L.ReLU(), L.Dense(1)])
    m.build((8, 3))
    m.compile(optimizers.sgd(rate=0.1), loss="mse")
    x = np.ones((8, 3), np.float32)
    y = np.zeros((8, 1), np.float32)
    first = m.fit(x, y)
    assert first is not None
    before = jax.tree_util.tree_map(np.asarray, m.parameters())
    m.cancel()
    assert m.fit(x, y) is None  # cancelled step: no work, no mutation
    after = jax.tree_util.tree_map(np.asarray, m.parameters())
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)
    assert m.fit(x, y) is not None  # flag cleared: training resumes
    # backward/apply_gradients honor it too
    m.cancel()
    assert m.backward(x, y) is None
    assert m.backward(x, y) is not None
    m.cancel()
    m.apply_gradients()  # cancelled: drops pending grads, no assert
    assert m._pending_grads is None
