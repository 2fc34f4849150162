"""Micro-ops IR tests (twin of test/unit/nnc/micro.tests.c)."""

import numpy as np
import pytest

from ccv_tpu.nn import micro


def _conv_combine(with_params: bool):
    """The reference's 'represent convolution with micro ops' graph
    (micro.tests.c:14-70): valid convolution via reindex -> mul -> sum."""
    x = micro.input(4)
    w = micro.input(4)
    if with_params:
        kh, kw, kc = "$kh", "$kw", "$kc"
        params = ["$kh", "$kw", "$kc"]
    else:
        kh, kw, kc = "3", "3", "2"
        params = []
    shape = ["dA0", f"dA1 - {kh} + 1", f"dA2 - {kw} + 1",
             kh, kw, "dA3", kc]
    xx = micro.reindex(shape, [x], ["i0", "i1 + i3", "i2 + i4", "i5"], x)
    ww = micro.reindex(shape, [x], ["i6", "i3", "i4", "i5"], w)
    yy = micro.binary(micro.BINARY_OP_MUL, xx, ww)
    y = micro.reduce(micro.REDUCE_OP_SUM, [3, 4, 5], yy)
    dy = micro.grad(y)
    dx = micro.grad(x)
    dw = micro.grad(w)
    c = micro.Combine([x, w], params, [y], [dy, x, w], [dx, dw])
    return c


@pytest.mark.parametrize("with_params", [True, False])
def test_micro_conv_forward_matches_lax(with_params):
    rng = np.random.default_rng(1)
    x = rng.random((1, 4, 4, 5), np.float32)
    w = rng.random((2, 3, 3, 5), np.float32)
    c = _conv_combine(with_params)
    values = [3, 3, 2] if with_params else []
    (y,) = c.interpret("forward", [x, w], values)
    # oracle: the existing convolution command (reference compares against
    # CMD_CONVOLUTION_FORWARD, micro.tests.c:100)
    from ccv_tpu.nn import ops
    import jax.numpy as jnp

    gt = np.asarray(ops.conv2d(jnp.asarray(x), jnp.asarray(w),
                               stride=(1, 1), padding="VALID"))
    np.testing.assert_allclose(y.reshape(gt.shape), gt, rtol=1e-5, atol=1e-5)


def test_micro_conv_backward_matches_autodiff():
    rng = np.random.default_rng(2)
    x = rng.random((1, 4, 4, 5), np.float32)
    w = rng.random((2, 3, 3, 5), np.float32)
    c = _conv_combine(True)
    dy = np.ones((1, 2, 2, 1, 1, 1, 2), np.float32)  # keepdims view
    dx, dw = c.interpret("backward", [dy, x, w], [3, 3, 2])
    # oracle: jax.grad of the plain conv
    import jax
    import jax.numpy as jnp
    from ccv_tpu.nn import ops

    def f(x_, w_):
        return ops.conv2d(x_, w_, stride=(1, 1), padding="VALID").sum()

    gdx, gdw = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(dx, np.asarray(gdx), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dw, np.asarray(gdw), rtol=1e-5, atol=1e-5)


def test_micro_matmul_with_grads():
    """micro.tests.c:232: matmul via reindex/mul/reduce + both gradients,
    including the dA1[=dB0] equality annotation."""
    a = micro.input(2)
    b = micro.input(2)
    aa = micro.reindex(["dA0", "dA1[=dB0]", "dB1"], [a, b],
                       ["i0", "i1"], a)
    bb = micro.reindex(["dA0", "dB0[=dA1]", "dB1"], [a, b],
                       ["i1", "i2"], b)
    cc = micro.binary(micro.BINARY_OP_MUL, aa, bb)
    c = micro.reduce(micro.REDUCE_OP_SUM, [1], cc)
    comb = micro.Combine([a, b], [], [c],
                         [micro.grad(c), a, b],
                         [micro.grad(a), micro.grad(b)])
    rng = np.random.default_rng(1)
    av = rng.random((4, 2), np.float32)
    bv = rng.random((2, 3), np.float32)
    (y,) = comb.interpret("forward", [av, bv])
    np.testing.assert_allclose(y.reshape(4, 3), av @ bv, rtol=1e-5)
    dc = np.ones((4, 1, 3), np.float32)
    da, db = comb.interpret("backward", [dc, av, bv])
    np.testing.assert_allclose(da, np.ones((4, 3), np.float32) @ bv.T,
                               rtol=1e-5)
    np.testing.assert_allclose(db, av.T @ np.ones((4, 3), np.float32),
                               rtol=1e-5)


def test_micro_shape_annotation_violated():
    a = micro.input(2)
    b = micro.input(2)
    aa = micro.reindex(["dA0", "dA1[=dB0]", "dB1"], [a, b], ["i0", "i1"], a)
    comb = micro.Combine([a, b], [], [aa])
    with pytest.raises(ValueError, match="annotation"):
        comb.interpret("forward", [np.ones((4, 2), np.float32),
                                   np.ones((5, 3), np.float32)])


def test_micro_unary_select_and_fill_behaviors():
    # transpose via reindex; out-of-bounds -> 0 (broadcast shift);
    # unary/exp; select = take_along_axis
    x = micro.input(2)
    t = micro.reindex(["dA1", "dA0"], [x], ["i1", "i0"], x)
    e = micro.unary(micro.UNARY_OP_EXP, t)
    comb = micro.Combine([x], [], [e])
    xv = np.arange(6, dtype=np.float32).reshape(2, 3)
    (y,) = comb.interpret("forward", [xv])
    np.testing.assert_allclose(y, np.exp(xv.T), rtol=1e-6)

    # shift by +1 along axis 1: the wrapped-off column reads 0
    s = micro.reindex(["dA0", "dA1"], [x], ["i0", "i1 - 1"], x)
    comb2 = micro.Combine([x], [], [s])
    (ys,) = comb2.interpret("forward", [xv])
    expect = np.zeros_like(xv)
    expect[:, 1:] = xv[:, :-1]
    np.testing.assert_allclose(ys, expect)

    idx = micro.input(2)
    sel = micro.select(1, x, idx)
    comb3 = micro.Combine([x, idx], [], [sel])
    iv = np.array([[2, 0, 1], [1, 1, 0]], np.float32)
    (yv,) = comb3.interpret("forward", [xv, iv])
    np.testing.assert_allclose(
        yv, np.take_along_axis(xv, iv.astype(int), axis=1))


def test_micro_reduce_ops_and_params():
    x = micro.input(2)
    params = ["$k"]
    scaled = micro.reindex(["dA0 / $k", "dA1"], [x], ["i0 * $k", "i1"], x)
    mx = micro.reduce(micro.REDUCE_OP_MAX, [1], scaled)
    comb = micro.Combine([x], params, [mx])
    xv = np.arange(12, dtype=np.float32).reshape(4, 3)
    (y,) = comb.interpret("forward", [xv], [2])
    np.testing.assert_allclose(y.reshape(2), xv[::2].max(1))


def test_micro_emit_artifact():
    x = micro.input(1)
    y = micro.unary(micro.UNARY_OP_EXP, x)
    comb = micro.Combine([x], [], [y])
    text = comb.emit([], [(8,)])
    assert "exp" in text  # the lowered module names the op


def test_micro_index_division_truncates_toward_zero():
    """C semantics: (i0 - 1) / 2 at i0 = 0 is 0 (not floor's -1), so the
    out-of-bounds mask keeps index 0 in range (ADVICE r3)."""
    x = micro.input(1)
    y = micro.reindex(["dA0"], [x], ["(i0 - 1) / 2"], x)
    c = micro.Combine([x], [], [y], [], [])
    src = np.arange(4, dtype=np.float32) + 1.0
    (out,) = c.interpret("forward", [src], [])
    # i0=0 -> (0-1)/2 = 0 (trunc); i0=1 -> 0; i0=2 -> 0; i0=3 -> 1
    np.testing.assert_allclose(out, [1.0, 1.0, 1.0, 2.0])


def test_micro_reindex_rank_mismatch_raises():
    x = micro.input(2)
    y = micro.reindex(["dA0"], [x], ["i0"], x)  # rank-2 input, 1 index
    c = micro.Combine([x], [], [y], [], [])
    with pytest.raises(ValueError, match="index expressions"):
        c.interpret("forward", [np.zeros((2, 2), np.float32)], [])
