"""Functional CNNP graph-model API tests (ccv_cnnp_model_new twin)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccv_tpu.nn import layers as L, optimizers
from ccv_tpu.nn.functional import (Add, Chunk, Concat, GRU, IndexSelect,
                                   Input, Model, Mul, Pick, Reduce)


def test_resnet_block_trains():
    """A conv residual block (the topology Sequential cannot express)."""
    x = Input()
    h = L.Convolution(8, (3, 3), padding="SAME", name="c1")(x)
    h = L.ReLU()(h)
    h = L.Convolution(8, (3, 3), padding="SAME", name="c2")(h)
    y = Add()(h, x)            # skip connection
    y = L.ReLU()(y)
    y = Reduce("mean", axis=(1, 2))(y)
    y = L.Dense(4, name="fc")(y)
    m = Model([x], [y])
    out = m.build((4, 8, 8, 8))
    assert out == (4, 4)
    m.compile(optimizers.adam(rate=1e-2), "softmax_crossentropy")
    rng = np.random.default_rng(0)
    X = rng.standard_normal((4, 8, 8, 8), np.float32)
    Y = rng.integers(0, 4, (4,))
    losses = [m.fit(X, Y) for _ in range(40)]
    assert losses[-1] < losses[0] * 0.3, losses[::10]


def test_multi_input_concat():
    a = Input()
    b = Input()
    ha = L.Dense(8, name="da")(a)
    hb = L.Dense(8, name="db")(b)
    y = Concat(axis=-1)(ha, hb)
    y = L.Dense(2, name="out")(y)
    m = Model([a, b], [y])
    assert m.build([(4, 3), (4, 5)]) == (4, 2)
    m.compile(optimizers.sgd(rate=0.1), "mse")
    X1 = np.ones((4, 3), np.float32)
    X2 = np.ones((4, 5), np.float32)
    out = m([X1, X2])
    assert np.asarray(out).shape == (4, 2)
    loss = m.fit([X1, X2], np.zeros((4, 2), np.float32))
    assert np.isfinite(loss)


def test_chunk_pick_mul():
    x = Input()
    parts = Chunk(2, axis=-1, name="split")(x)
    p0 = Pick(0)(parts)
    p1 = Pick(1)(parts)
    y = Mul()(p0, p1)
    m = Model([x], [y])
    assert m.build((3, 6)) == (3, 3)
    v = np.arange(18, dtype=np.float32).reshape(3, 6)
    out = np.asarray(m(v))
    np.testing.assert_allclose(out, v[:, :3] * v[:, 3:])


def test_gru_shapes_and_grad():
    x = Input()
    y = GRU(12, name="g")(x)
    y = Reduce("mean", axis=1)(y)
    y = L.Dense(2, name="out")(y)
    m = Model([x], [y])
    assert m.build((2, 7, 5)) == (2, 2)
    m.compile(optimizers.adam(rate=1e-2), "mse")
    X = np.random.default_rng(1).standard_normal((2, 7, 5)).astype(np.float32)
    losses = [m.fit(X, np.ones((2, 2), np.float32)) for _ in range(20)]
    assert losses[-1] < losses[0]


def test_index_select():
    x = Input()
    idx = Input()
    y = IndexSelect()(x, idx)
    m = Model([x, idx], [y])
    assert m.build([(5, 3), (2,)]) == (2, 3)
    table = np.arange(15, dtype=np.float32).reshape(5, 3)
    out = np.asarray(m([table, np.array([4, 0])]))
    np.testing.assert_allclose(out, table[[4, 0]])


def test_model_write_read_roundtrip(tmp_path):
    def build():
        x = Input()
        h = L.Dense(6, name="d1")(x)
        y = Add()(L.Dense(6, name="d2")(h), h)
        m = Model([x], [y], name="rt")
        m.build((2, 4), key=jax.random.PRNGKey(1))
        return m

    m1 = build()
    p = str(tmp_path / "m.sqlite3")
    m1.write(p)
    m2 = build()
    m2.params = jax.tree_util.tree_map(lambda v: v * 0, m2.params)
    m2.read(p)
    X = np.ones((2, 4), np.float32)
    np.testing.assert_allclose(np.asarray(m1(X)), np.asarray(m2(X)))


def test_data_parallel_graph_model():
    """set_data_parallel works on graph models over the 8-device CPU mesh."""
    x = Input()
    h = L.Dense(16, name="d1")(x)
    y = L.Dense(4, name="out")(Add()(L.ReLU()(h), h))
    m = Model([x], [y])
    m.build((16, 8))
    m.compile(optimizers.sgd(rate=0.05), "softmax_crossentropy")
    single = [np.asarray(v).copy() for v in
              jax.tree_util.tree_leaves(m.params)]
    m.set_data_parallel(8)
    X = np.random.default_rng(2).standard_normal((16, 8)).astype(np.float32)
    Y = np.random.default_rng(3).integers(0, 4, (16,))
    loss = m.fit(X, Y)
    assert np.isfinite(loss)


def test_remaining_simple_ctors():
    """Touch every remaining addon ctor (ccv_cnnp_model_addons.c parity)."""
    from ccv_tpu.nn.functional import (ArgMax, ArgMin, Clamp, CMul,
                                       Contiguous, DatatypeConversion, Div,
                                       MaskedFill, Matmul, Max, Min, Move,
                                       Parameter, Scalar, ScalarMul, Sqrt,
                                       Variable)

    a = Input()
    b = Input()
    nodes = {
        "div": Div()(a, b),
        "max": Max()(a, b),
        "min": Min()(a, b),
        "matmul": Matmul(transpose_b=True)(a, b),
        "masked": MaskedFill(0.0, -1.0)(a, b),
        "smul": ScalarMul(2.5)(a),
        "clamp": Clamp(0.0, 1.0)(a),
        "sqrt": Sqrt()(Clamp(0.0, None)(a)),
        "argmax": ArgMax()(a),
        "argmin": ArgMin()(a),
        "cast": DatatypeConversion(jnp.bfloat16)(a),
        "contig": Contiguous()(a),
        "move": Move()(a),
        "param": Parameter((3,), 0.1)(a),
        "variable": Variable((3,))(a),
        "cmul": CMul()(a, b),
    }
    m = Model([a, b], list(nodes.values()))
    shapes = m.build([(2, 4), (2, 4)])
    x = np.abs(np.random.default_rng(0).standard_normal((2, 4))
               ).astype(np.float32)
    ydata = np.abs(np.random.default_rng(1).standard_normal((2, 4))
                   ).astype(np.float32) + 0.5
    outs = m([x, ydata])
    res = dict(zip(nodes, outs))
    np.testing.assert_allclose(np.asarray(res["div"]), x / ydata, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res["max"]), np.maximum(x, ydata))
    np.testing.assert_allclose(np.asarray(res["matmul"]), x @ ydata.T,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res["smul"]), x * 2.5)
    assert np.asarray(res["argmax"]).shape == (2,)
    assert res["cast"].dtype == jnp.bfloat16
    assert np.asarray(res["param"]).shape == (3,)
    # complex mul: (1+2i) * (3+4i) = -5 + 10i
    c1 = np.array([[1.0, 2.0, 0.0, 1.0]], np.float32)
    c2 = np.array([[3.0, 4.0, 2.0, 0.0]], np.float32)
    from ccv_tpu.nn.functional import CMul as _CMul

    out, _ = _CMul().apply({}, {}, [jnp.asarray(c1), jnp.asarray(c2)])
    np.testing.assert_allclose(np.asarray(out),
                               [[-5.0, 10.0, 0.0, 2.0]], atol=1e-6)


def test_squeeze_cmdexec_dynamic():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ccv_tpu.nn import functional as F, layers, ops

    x = F.Input(shape=(2, 4, 1, 8))
    h = F.Squeeze(axis=2)(x)
    h = F.CmdExec(lambda v: ops.gelu(v))(h)
    y = F.Dynamic(lambda shape: layers.Dense(shape[-1] * 2))(h)
    m = F.Model([x], [y])
    xv = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 1, 8))
    m.build([(2, 4, 1, 8)], key=jax.random.PRNGKey(1))
    out = m([xv])
    out = out[0] if isinstance(out, (tuple, list)) else out
    assert out.shape == (2, 4, 16)
    assert np.isfinite(np.asarray(out)).all()
