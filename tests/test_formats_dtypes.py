"""Format (NHWC/NCHW/CHWN) and dtype (f32/bf16/f16) coverage of the op set.

The reference threads tensor formats and 8 datatypes through every kernel
via the per-backend registry masks (lib/nnc/ccv_nnc.h:45-77,
ccv_nnc_internal.h:197-204; e.g. GEMM cpu_ref = NHWC|NCHW x 32F,
cmd/blas/ccv_nnc_gemm_cpu_ref.c:450). These tests are the TPU build's
equivalent of the reference's per-op format/datatype matrix in
test/unit/nnc: every format-sensitive op computes the same values in every
layout, every float op preserves its input dtype and stays close to the
f32 oracle at that dtype's precision, and the registry metadata answers
cmd_ok(dtype=, format=) honestly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ccv_tpu.nn import cmd, ops

RNG = np.random.default_rng(7)


def _img(shape=(2, 6, 8, 3), dtype=jnp.float32):
    return jnp.asarray(RNG.standard_normal(shape), dtype)


# ---------------------------------------------------------------------------
# format_transform: semantic relayout between named formats
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("src", ops.FORMATS)
@pytest.mark.parametrize("dst", ops.FORMATS)
def test_format_transform_round_trip(src, dst):
    x = _img((2, 3, 4, 5))
    y = ops.format_transform(x, src=src, dst=dst)
    back = ops.format_transform(y, src=dst, dst=src)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_format_transform_nhwc_to_nchw_layout():
    x = _img((1, 2, 3, 4))
    y = ops.format_transform(x, src="NHWC", dst="NCHW")
    assert y.shape == (1, 4, 2, 3)
    np.testing.assert_array_equal(np.asarray(y),
                                  np.transpose(np.asarray(x), (0, 3, 1, 2)))


def test_format_transform_chwn_shape():
    x = _img((2, 3, 4, 5))  # NHWC
    y = ops.format_transform(x, src="NHWC", dst="CHWN")
    assert y.shape == (5, 3, 4, 2)


def test_format_perm_composes():
    # going NHWC->NCHW->CHWN must equal NHWC->CHWN
    x = _img((2, 3, 4, 5))
    via = ops.format_transform(
        ops.format_transform(x, src="NHWC", dst="NCHW"),
        src="NCHW", dst="CHWN")
    direct = ops.format_transform(x, src="NHWC", dst="CHWN")
    np.testing.assert_array_equal(np.asarray(via), np.asarray(direct))


# ---------------------------------------------------------------------------
# conv / pool / batch_norm: identical math in every layout
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("format", ["NCHW", "CHWN"])
@pytest.mark.parametrize("stride,padding", [((1, 1), "SAME"),
                                            ((2, 2), "VALID")])
def test_conv2d_format_equivalence(format, stride, padding):
    x = _img((2, 8, 8, 3))
    w = _img((4, 3, 3, 3))  # OHWI
    b = _img((4,))
    ref = ops.conv2d(x, w, b, stride=stride, padding=padding)
    xf = ops.format_transform(x, src="NHWC", dst=format)
    out = ops.conv2d(xf, w, b, stride=stride, padding=padding,
                     format=format)
    out = ops.format_transform(out, src=format, dst="NHWC")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("format", ["NCHW", "CHWN"])
def test_conv2d_grouped_format(format):
    x = _img((1, 6, 6, 4))
    w = _img((8, 3, 3, 2))  # groups=2
    ref = ops.conv2d(x, w, groups=2)
    xf = ops.format_transform(x, src="NHWC", dst=format)
    out = ops.format_transform(
        ops.conv2d(xf, w, groups=2, format=format), src=format, dst="NHWC")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("format", ["NCHW", "CHWN"])
@pytest.mark.parametrize("op", [ops.max_pool, ops.avg_pool])
def test_pool_format_equivalence(format, op):
    x = _img((2, 8, 8, 3))
    ref = op(x, size=(2, 2))
    xf = ops.format_transform(x, src="NHWC", dst=format)
    out = ops.format_transform(op(xf, size=(2, 2), format=format),
                               src=format, dst="NHWC")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("format", ["NCHW", "CHWN"])
def test_batch_norm_format_equivalence(format):
    x = _img((2, 6, 6, 5))
    scale, bias = _img((5,)), _img((5,))
    mean = _img((5,))
    var = jnp.abs(_img((5,))) + 0.5
    ref = ops.batch_norm(x, scale, bias, mean, var)
    xf = ops.format_transform(x, src="NHWC", dst=format)
    out = ops.format_transform(
        ops.batch_norm(xf, scale, bias, mean, var, format=format),
        src=format, dst="NHWC")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_batch_norm_format_training_stats():
    x = _img((2, 6, 6, 5))
    scale, bias = jnp.ones((5,)), jnp.zeros((5,))
    mean, var = jnp.zeros((5,)), jnp.ones((5,))
    y_ref, m_ref, v_ref = ops.batch_norm(x, scale, bias, mean, var,
                                         is_training=True)
    xf = ops.format_transform(x, src="NHWC", dst="NCHW")
    y, m, v = ops.batch_norm(xf, scale, bias, mean, var, is_training=True,
                             format="NCHW")
    y = ops.format_transform(y, src="NCHW", dst="NHWC")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m).ravel(), np.asarray(m_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v).ravel(), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# dtype sweep: f16/bf16 ops preserve dtype and track the f32 oracle
# ---------------------------------------------------------------------------

_UNARY = [ops.relu, ops.leaky_relu, ops.sigmoid, ops.tanh, ops.swish,
          ops.gelu, ops.softmax, ops.ewexp, ops.ewabs, ops.ewneg,
          ops.ewsqrt]
_BINARY = [ops.add, ops.mul, ops.ewdiv, ops.ewmin, ops.ewmax]
_TOL = {jnp.float16: 2e-2, jnp.bfloat16: 1e-1}


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.bfloat16])
@pytest.mark.parametrize("op", _UNARY, ids=lambda f: f.__name__)
def test_unary_dtype(op, dtype):
    x32 = jnp.abs(_img((4, 16))) + 0.1  # positive domain covers sqrt/log
    x = x32.astype(dtype)
    out = op(x)
    assert out.dtype == dtype, f"{op.__name__} changed dtype to {out.dtype}"
    ref = op(x32)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=_TOL[dtype], atol=_TOL[dtype])


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.bfloat16])
@pytest.mark.parametrize("op", _BINARY, ids=lambda f: f.__name__)
def test_binary_dtype(op, dtype):
    a32 = jnp.abs(_img((4, 16))) + 0.5
    b32 = jnp.abs(_img((4, 16))) + 0.5
    out = op(a32.astype(dtype), b32.astype(dtype))
    assert out.dtype == dtype
    ref = op(a32, b32)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=_TOL[dtype], atol=_TOL[dtype])


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.bfloat16])
def test_gemm_dtype(dtype):
    a32, w32 = _img((8, 16)), _img((16, 8))
    out = ops.gemm(a32.astype(dtype), w32.astype(dtype))
    assert out.dtype == dtype
    ref = ops.gemm(a32, w32)
    # f32 accumulation via preferred_element_type: error is input-rounding
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=_TOL[dtype], atol=4 * _TOL[dtype])


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.bfloat16])
def test_conv2d_dtype(dtype):
    x32, w32 = _img((1, 8, 8, 3)), _img((4, 3, 3, 3))
    out = ops.conv2d(x32.astype(dtype), w32.astype(dtype))
    assert out.dtype == dtype
    ref = ops.conv2d(x32, w32)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=_TOL[dtype], atol=8 * _TOL[dtype])


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.bfloat16])
@pytest.mark.parametrize("op", [ops.layer_norm, ops.rmsnorm],
                         ids=lambda f: f.__name__)
def test_norm_dtype(op, dtype):
    x32 = _img((4, 32))
    scale = jnp.ones((32,))
    out = op(x32.astype(dtype), scale)
    assert out.dtype == dtype
    ref = op(x32, scale)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=_TOL[dtype], atol=_TOL[dtype])


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.bfloat16])
def test_reduce_dtype(dtype):
    x32 = _img((4, 8, 8))
    for op in (ops.reduce_sum, ops.reduce_mean, ops.reduce_max,
               ops.reduce_min):
        out = op(x32.astype(dtype), axis=(1,))
        assert out.dtype == dtype, op.__name__
        ref = op(x32, axis=(1,))
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref),
                                   rtol=_TOL[dtype], atol=2 * _TOL[dtype])


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.bfloat16])
def test_softmax_crossentropy_dtype(dtype):
    logits32 = _img((4, 10))
    labels = jnp.asarray(RNG.integers(0, 10, (4,)), jnp.int32)
    loss, sm = ops.softmax_crossentropy(logits32.astype(dtype), labels)
    ref_loss, ref_sm = ops.softmax_crossentropy(logits32, labels)
    np.testing.assert_allclose(np.asarray(loss, np.float32),
                               np.asarray(ref_loss, np.float32),
                               rtol=_TOL[dtype], atol=_TOL[dtype])
    np.testing.assert_allclose(np.asarray(sm, np.float32),
                               np.asarray(ref_sm, np.float32),
                               rtol=_TOL[dtype], atol=_TOL[dtype])


# ---------------------------------------------------------------------------
# multi-shape sweeps (one per heavy cmd family, test_cmd_complete style)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("m,k,n", [(1, 7, 5), (8, 16, 8), (33, 65, 17)])
def test_gemm_shapes(m, k, n):
    a, w = _img((m, k)), _img((k, n))
    np.testing.assert_allclose(np.asarray(ops.gemm(a, w)),
                               np.asarray(a) @ np.asarray(w),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hw,kh,stride", [(5, 1, 1), (9, 3, 2), (12, 5, 3)])
def test_conv2d_shapes(hw, kh, stride):
    x = _img((1, hw, hw, 2))
    w = _img((3, kh, kh, 2))
    out = ops.conv2d(x, w, stride=(stride, stride), padding="VALID")
    # oracle: jax-free dense correlation
    xn, wn = np.asarray(x, np.float64), np.asarray(w, np.float64)
    oh = (hw - kh) // stride + 1
    ref = np.zeros((1, oh, oh, 3))
    for o in range(3):
        for i in range(oh):
            for j in range(oh):
                patch = xn[0, i * stride:i * stride + kh,
                           j * stride:j * stride + kh, :]
                ref[0, i, j, o] = np.sum(patch * wn[o])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,axis", [((6,), (0,)), ((4, 5), (1,)),
                                        ((2, 3, 4), (0, 2))])
def test_reduce_shapes(shape, axis):
    x = _img(shape)
    for op, npop in [(ops.reduce_sum, np.sum), (ops.reduce_mean, np.mean),
                     (ops.reduce_max, np.max), (ops.reduce_min, np.min)]:
        out = op(x, axis=axis)
        ref = npop(np.asarray(x), axis=axis, keepdims=True)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5,
                                   atol=1e-5)


# ---------------------------------------------------------------------------
# registry metadata: cmd_ok answers per-dtype/per-format questions
# ---------------------------------------------------------------------------

def test_cmd_ok_dtype_format():
    assert cmd.cmd_ok("CCV_NNC_CONVOLUTION_FORWARD", dtype="float16",
                      format="NCHW")
    assert cmd.cmd_ok("CCV_NNC_GEMM_FORWARD", dtype="bfloat16")
    assert not cmd.cmd_ok("CCV_NNC_GEMM_FORWARD", dtype="int32")
    assert not cmd.cmd_ok("CCV_NNC_ROI_ALIGN_FORWARD", format="NCHW")
    assert cmd.cmd_ok("CCV_NNC_FORMAT_TRANSFORM_FORWARD", dtype="uint8")
    assert not cmd.cmd_ok("CCV_NNC_NOT_A_CMD")


def test_cmd_allow_inplace():
    # elementwise ops may write onto their first input (the reference's
    # allow-inplace rule); gemm may not
    assert cmd.cmd_allow_inplace("CCV_NNC_RELU_FORWARD", 0, 0)
    assert not cmd.cmd_allow_inplace("CCV_NNC_GEMM_FORWARD", 0, 0)
    assert cmd.cmd_allow_inplace("CCV_NNC_SGD_FORWARD", 1, 1)


def test_cmd_arity_metadata():
    assert cmd.cmd_entry("CCV_NNC_SOFTMAX_CROSSENTROPY_FORWARD").arity == \
        (2, 2)
    assert cmd.cmd_entry("CCV_NNC_BATCH_NORM_FORWARD").arity == (5, 3)


def test_registry_capability_claims_hold():
    """Spot-execute each claimed (op, dtype) pair for elementwise cmds —
    the registry must not claim support the lowering lacks."""
    for name in ("CCV_NNC_RELU_FORWARD", "CCV_NNC_TANH_FORWARD",
                 "CCV_NNC_EWEXP_FORWARD"):
        e = cmd.cmd_entry(name)
        for dt in e.dtypes:
            x = jnp.ones((2, 2), jnp.dtype(dt))
            out = e.fn(x)
            assert out.shape == (2, 2)
