"""Per-op value-oracle matrix for the remaining cmd families — widens the
op-level coverage toward the reference's test/unit/nnc density (one
multi-shape sweep per family, numpy/hand-rolled oracles, the cpu_ref-is-
the-oracle pattern of the reference's GPU tests).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccv_tpu.nn import ops

RNG = np.random.default_rng(11)


def _t(shape, dtype=jnp.float32, positive=False):
    a = RNG.standard_normal(shape)
    if positive:
        a = np.abs(a) + 0.1
    return jnp.asarray(a, dtype)


# --- blas ------------------------------------------------------------------

@pytest.mark.parametrize("ta,tb", [(False, False), (True, False),
                                   (False, True), (True, True)])
def test_gemm_transposes(ta, tb):
    a = _t((5, 7) if not ta else (7, 5))
    w = _t((7, 3) if not tb else (3, 7))
    out = ops.gemm(a, w, transpose_a=ta, transpose_b=tb)
    an = np.asarray(a).T if ta else np.asarray(a)
    wn = np.asarray(w).T if tb else np.asarray(w)
    np.testing.assert_allclose(np.asarray(out), an @ wn, rtol=1e-5,
                               atol=1e-5)


def test_gemm_bias():
    a, w, b = _t((4, 6)), _t((6, 3)), _t((3,))
    np.testing.assert_allclose(np.asarray(ops.gemm(a, w, b)),
                               np.asarray(a) @ np.asarray(w) + np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_add_mul_scalars():
    a, b = _t((3, 4)), _t((3, 4))
    np.testing.assert_allclose(np.asarray(ops.add(a, b, p=0.5, q=2.0)),
                               0.5 * np.asarray(a) + 2.0 * np.asarray(b),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.mul(a, b, p=3.0)),
                               3.0 * np.asarray(a) * np.asarray(b),
                               rtol=1e-6)


def test_add_broadcasts():
    a, b = _t((3, 4)), _t((4,))
    np.testing.assert_allclose(np.asarray(ops.add(a, b)),
                               np.asarray(a) + np.asarray(b), rtol=1e-6)


def test_cmul_complex_pairs():
    a, b = _t((2, 8)), _t((2, 8))
    out = np.asarray(ops.cmul(a, b))
    an, bn = np.asarray(a), np.asarray(b)
    ac = an[..., 0::2] + 1j * an[..., 1::2]
    bc = bn[..., 0::2] + 1j * bn[..., 1::2]
    cc = ac * bc
    np.testing.assert_allclose(out[..., 0::2], cc.real, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(out[..., 1::2], cc.imag, rtol=1e-5,
                               atol=1e-6)


# --- elementwise -----------------------------------------------------------

def test_ewsum_ewprod_multiarg():
    xs = [_t((2, 3)) for _ in range(4)]
    np.testing.assert_allclose(np.asarray(ops.ewsum(*xs)),
                               sum(np.asarray(x) for x in xs), rtol=1e-6)
    prod = np.ones((2, 3), np.float32)
    for x in xs:
        prod = prod * np.asarray(x)
    np.testing.assert_allclose(np.asarray(ops.ewprod(*xs)), prod,
                               rtol=1e-5, atol=1e-6)


def test_clamp_modes():
    x = _t((4, 4))
    xn = np.asarray(x)
    np.testing.assert_allclose(np.asarray(ops.clamp(x, -0.5, 0.5)),
                               np.clip(xn, -0.5, 0.5))
    np.testing.assert_allclose(np.asarray(ops.clamp(x, lo=0.0)),
                               np.maximum(xn, 0.0))
    np.testing.assert_allclose(np.asarray(ops.clamp(x, hi=0.0)),
                               np.minimum(xn, 0.0))


@pytest.mark.parametrize("op,ref", [
    (ops.leaky_relu, lambda x: np.where(x > 0, x, 0.01 * x)),
    (ops.swish, lambda x: x / (1 + np.exp(-x))),
    (ops.ewlog, lambda x: np.log(x)),
])
def test_elementwise_formulas(op, ref):
    x = _t((3, 5), positive=True)
    np.testing.assert_allclose(np.asarray(op(x)), ref(np.asarray(x)),
                               rtol=1e-5, atol=1e-6)


def test_gelu_both_forms():
    x = _t((3, 5))
    xn = np.asarray(x, np.float64)
    exact = xn * 0.5 * (1 + np.vectorize(math.erf)(xn / math.sqrt(2)))
    np.testing.assert_allclose(np.asarray(ops.gelu(x)), exact, rtol=1e-4,
                               atol=1e-5)
    tanh_form = 0.5 * xn * (1 + np.tanh(
        math.sqrt(2 / math.pi) * (xn + 0.044715 * xn ** 3)))
    np.testing.assert_allclose(np.asarray(ops.gelu(x, tanh_approx=True)),
                               tanh_form, rtol=1e-4, atol=1e-5)


def test_masked_fill():
    x = _t((3, 4))
    mask = jnp.asarray(RNG.integers(0, 2, (3, 4)), jnp.float32)
    out = np.asarray(ops.masked_fill(x, mask, eq=0.0, fill=-9.0))
    ref = np.where(np.asarray(mask) == 0.0, -9.0, np.asarray(x))
    np.testing.assert_allclose(out, ref)


# --- util / layout ---------------------------------------------------------

@pytest.mark.parametrize("mode", ["zero", "replicate"])
def test_pad_modes(mode):
    x = _t((2, 3))
    out = np.asarray(ops.pad(x, (1, 0), (0, 2), mode=mode))
    ref = np.pad(np.asarray(x), ((1, 0), (0, 2)),
                 mode="constant" if mode == "zero" else "edge")
    np.testing.assert_allclose(out, ref)
    assert out.shape == (3, 5)


def test_pad_constant_value():
    x = _t((2, 2))
    out = np.asarray(ops.pad(x, (1, 1), (1, 1), mode="zero", value=7.0))
    assert out[0, 0] == 7.0 and out[-1, -1] == 7.0


@pytest.mark.parametrize("axis", [0, 1])
def test_index_select(axis):
    x = _t((5, 6))
    idx = jnp.asarray([3, 0, 3], jnp.int32)
    np.testing.assert_allclose(
        np.asarray(ops.index_select(x, idx, axis=axis)),
        np.take(np.asarray(x), [3, 0, 3], axis=axis))


def test_set_and_datatype_conversion():
    out = ops.set_((2, 3), 1.5)
    np.testing.assert_allclose(np.asarray(out), 1.5)
    i = ops.datatype_conversion(out, jnp.int32)
    assert i.dtype == jnp.int32 and int(i[0, 0]) == 1


def test_transpose_axes():
    x = _t((2, 3, 4))
    np.testing.assert_allclose(np.asarray(ops.transpose(x, 1, 2)),
                               np.swapaxes(np.asarray(x), 1, 2))


@pytest.mark.parametrize("mode", ["nearest", "bilinear"])
def test_upsample_shapes(mode):
    x = _t((1, 4, 6, 2))
    out = ops.upsample(x, 2.0, 2.0, mode=mode)
    assert out.shape == (1, 8, 12, 2)
    if mode == "nearest":
        np.testing.assert_allclose(np.asarray(out)[0, ::2, ::2],
                                   np.asarray(x)[0])


def test_histogram_even_bins():
    x = jnp.asarray(RNG.uniform(0, 1, (100,)), jnp.float32)
    h = np.asarray(ops.histogram(x, bins=10, lo=0.0, hi=1.0))
    ref, _ = np.histogram(np.asarray(x), bins=10, range=(0, 1))
    np.testing.assert_array_equal(h, ref)
    assert h.sum() == 100


# --- losses ----------------------------------------------------------------

def test_smooth_l1_regions():
    x = jnp.asarray([[0.1, 2.0]], jnp.float32)
    y = jnp.zeros((1, 2), jnp.float32)
    out = float(ops.smooth_l1_loss(x, y, beta=1.0)[0])
    np.testing.assert_allclose(out, 0.5 * 0.01 + (2.0 - 0.5), rtol=1e-5)


def test_binary_crossentropy_pos_weight():
    p = jnp.asarray([[0.8, 0.3]], jnp.float32)
    y = jnp.asarray([[1.0, 0.0]], jnp.float32)
    out = float(ops.binary_crossentropy(p, y, pos_weight=2.0)[0])
    ref = -(2.0 * math.log(0.8) + math.log(0.7))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_categorical_crossentropy_soft_and_hard():
    probs = jnp.asarray([[0.7, 0.2, 0.1]], jnp.float32)
    hard = ops.categorical_crossentropy(probs, jnp.asarray([0], jnp.int32))
    np.testing.assert_allclose(float(hard[0]), -math.log(0.7), rtol=1e-5)
    soft = ops.categorical_crossentropy(
        probs, jnp.asarray([[0.5, 0.5, 0.0]], jnp.float32))
    np.testing.assert_allclose(float(soft[0]),
                               -(0.5 * math.log(0.7) + 0.5 * math.log(0.2)),
                               rtol=1e-5)


def test_label_smoothing_trim():
    probs = jnp.asarray([[0.7, 0.2, 0.1]], jnp.float32)
    out = ops.categorical_crossentropy(probs, jnp.asarray([0], jnp.int32),
                                       trim0=0.05, trim1=0.9)
    logp = np.log([0.7, 0.2, 0.1])
    onehot = np.asarray([0.9, 0.05, 0.05])
    np.testing.assert_allclose(float(out[0]), -np.sum(onehot * logp),
                               rtol=1e-5)


# --- reduce ----------------------------------------------------------------

def test_reduce_norm2_isnan():
    x = _t((3, 4))
    np.testing.assert_allclose(
        np.asarray(ops.reduce_norm2(x, axis=(1,))),
        np.linalg.norm(np.asarray(x), axis=1, keepdims=True), rtol=1e-5)
    with_nan = x.at[1, 2].set(jnp.nan)
    out = np.asarray(ops.reduce_isnan(with_nan, axis=(1,)))
    assert out[1, 0] and not out[0, 0]


def test_argmax_argmin():
    x = _t((4, 7))
    np.testing.assert_array_equal(np.asarray(ops.argmax(x)),
                                  np.argmax(np.asarray(x), axis=-1))
    np.testing.assert_array_equal(np.asarray(ops.argmin(x, axis=0)),
                                  np.argmin(np.asarray(x), axis=0))


# --- random / dropout ------------------------------------------------------

def test_random_uniform_range_and_stats():
    key = jax.random.PRNGKey(0)
    x = np.asarray(ops.random_uniform(key, (5000,), lb=-2.0, ub=3.0))
    assert x.min() >= -2.0 and x.max() <= 3.0
    assert abs(x.mean() - 0.5) < 0.1


def test_random_normal_stats():
    key = jax.random.PRNGKey(1)
    x = np.asarray(ops.random_normal(key, (5000,), std=2.0, mean=1.0))
    assert abs(x.mean() - 1.0) < 0.15 and abs(x.std() - 2.0) < 0.15


def test_dropout_scale_and_zeros():
    key = jax.random.PRNGKey(2)
    x = jnp.ones((1000,))
    out = np.asarray(ops.dropout(x, 0.25, key))
    kept = out != 0.0
    assert abs(kept.mean() - 0.75) < 0.05
    np.testing.assert_allclose(out[kept], 1.0 / 0.75, rtol=1e-5)


# --- detection utilities ---------------------------------------------------

def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 10, 10], [50, 50, 5, 5]],
                        jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
    order, keep = ops.nms(boxes, scores, iou_threshold=0.5)
    order, keep = np.asarray(order), np.asarray(keep)
    kept = set(order[keep].tolist())
    assert kept == {0, 2}  # box 1 suppressed by box 0


def test_nms_keeps_disjoint():
    boxes = jnp.asarray([[0, 0, 5, 5], [20, 20, 5, 5], [40, 40, 5, 5]],
                        jnp.float32)
    scores = jnp.asarray([0.5, 0.9, 0.1], jnp.float32)
    order, keep = ops.nms(boxes, scores, iou_threshold=0.3)
    assert np.asarray(keep).all()
    assert np.asarray(order).tolist() == [1, 0, 2]  # score-descending


def test_roi_align_constant_field():
    # a constant feature map must pool to the constant, any roi
    x = jnp.full((8, 8, 3), 2.5, jnp.float32)
    rois = jnp.asarray([[0.1, 0.1, 0.5, 0.5], [0.0, 0.0, 1.0, 1.0]],
                       jnp.float32)
    out = np.asarray(ops.roi_align(x, rois, 4, 4))
    assert out.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(out, 2.5, rtol=1e-5)


# --- attention / rnn -------------------------------------------------------

def test_sdpa_matches_manual():
    q, k, v = _t((1, 4, 2, 8)), _t((1, 6, 2, 8)), _t((1, 6, 2, 8))
    out = np.asarray(ops.scaled_dot_product_attention(q, k, v))
    qn, kn, vn = (np.asarray(a, np.float64) for a in (q, k, v))
    ref = np.empty((1, 4, 2, 8))
    for h in range(2):
        logits = qn[0, :, h] @ kn[0, :, h].T / math.sqrt(8)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref[0, :, h] = p @ vn[0, :, h]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_sdpa_causal_mask():
    q = _t((1, 5, 1, 4))
    k, v = q, _t((1, 5, 1, 4))
    out = ops.scaled_dot_product_attention(q, k, v, is_causal=True)
    # first position may only attend to itself -> output = v[0]
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0],
                               np.asarray(v)[0, 0, 0], rtol=1e-5)


def test_lstm_matches_manual_loop():
    T, B, I, H = 3, 2, 4, 5
    x = _t((T, B, I))
    w_ih, w_hh = _t((I, 4 * H)), _t((H, 4 * H))
    b_ih, b_hh = _t((4 * H,)), _t((4 * H,))
    ys, hT, cT = ops.lstm(x, w_ih, w_hh, b_ih, b_hh)

    def sig(a):
        return 1 / (1 + np.exp(-a))

    h = np.zeros((B, H))
    c = np.zeros((B, H))
    xn = np.asarray(x, np.float64)
    for t in range(T):
        g = (xn[t] @ np.asarray(w_ih) + np.asarray(b_ih)
             + h @ np.asarray(w_hh) + np.asarray(b_hh))
        i_, f_, g_, o_ = np.split(g, 4, axis=-1)
        c = sig(f_) * c + sig(i_) * np.tanh(g_)
        h = sig(o_) * np.tanh(c)
    np.testing.assert_allclose(np.asarray(hT), h, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), c, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ys)[-1], h, rtol=1e-4, atol=1e-5)


def test_lstm_reverse():
    x = _t((4, 1, 3))
    w_ih, w_hh = _t((3, 8)), _t((2, 8))
    ys_f, _, _ = ops.lstm(x, w_ih, w_hh)
    ys_r, _, _ = ops.lstm(x[::-1], w_ih, w_hh)
    ys_rev, _, _ = ops.lstm(x, w_ih, w_hh, reverse=True)
    np.testing.assert_allclose(np.asarray(ys_rev), np.asarray(ys_r[::-1]),
                               rtol=1e-5, atol=1e-6)


# --- backward spot checks (jax.grad is the backward registry) --------------

@pytest.mark.parametrize("op", [ops.relu, ops.sigmoid, ops.tanh, ops.gelu],
                         ids=lambda f: f.__name__)
def test_unary_backward_finite_difference(op):
    x = _t((6,))
    g = np.asarray(jax.grad(lambda a: jnp.sum(op(a)))(x))
    eps = 1e-3
    xn = np.asarray(x)
    for i in range(6):
        d = xn.copy()
        d[i] += eps
        fd = (float(jnp.sum(op(jnp.asarray(d))))
              - float(jnp.sum(op(x)))) / eps
        np.testing.assert_allclose(g[i], fd, rtol=5e-2, atol=5e-3)


def test_conv2d_backward_shapes():
    x, w = _t((1, 6, 6, 2)), _t((3, 3, 3, 2))
    gx, gw = jax.grad(lambda a, b: jnp.sum(ops.conv2d(a, b) ** 2),
                      argnums=(0, 1))(x, w)
    assert gx.shape == x.shape and gw.shape == w.shape


def test_sdpa_backward_runs():
    q, k, v = _t((1, 4, 2, 8)), _t((1, 4, 2, 8)), _t((1, 4, 2, 8))
    g = jax.grad(lambda a: jnp.sum(
        ops.scaled_dot_product_attention(a, k, v)))(q)
    assert g.shape == q.shape and bool(jnp.all(jnp.isfinite(g)))
