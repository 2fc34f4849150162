"""The NNC command set as jittable functions (reference: lib/nnc/cmd/*).

Each public function here corresponds to a CCV_NNC_*_FORWARD command family
(lib/nnc/cmd/ccv_nnc_cmd.inc lists all 139); backward passes come for free
from jax.grad, mirroring the reference's symbolic autodiff (the backward
command registry). Layout is NHWC (the reference's default CPU layout,
lib/nnc/ccv_nnc_tensor.c) and the MXU path keeps convs/gemms in bf16 when
asked.

Not here: COMM_* collectives (ccv_tpu.parallel — they're lax.psum et al.),
palettize (ccv_tpu.nn.palettize), LSSC compression (ccv_tpu.nn.compression).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# tensor formats (reference: CCV_TENSOR_FORMAT_* lib/nnc/ccv_nnc.h:45-49).
# The reference threads the format through every kernel's registry mask;
# here format-sensitive ops (conv/pool/norm) take format= directly and XLA
# picks layouts. CHWN is the reference's cuda-convnet legacy layout.
FORMAT_NHWC = "NHWC"
FORMAT_NCHW = "NCHW"
FORMAT_CHWN = "CHWN"
FORMATS = (FORMAT_NHWC, FORMAT_NCHW, FORMAT_CHWN)

# axis-permutation between any two formats (4-D tensors)
_FORMAT_AXES = {  # format -> position of (N, H, W, C)
    FORMAT_NHWC: (0, 1, 2, 3),
    FORMAT_NCHW: (0, 2, 3, 1),
    FORMAT_CHWN: (3, 1, 2, 0),
}


def format_perm(src: str, dst: str) -> Tuple[int, ...]:
    """The jnp.transpose permutation converting format `src` -> `dst`."""
    s, d = _FORMAT_AXES[src], _FORMAT_AXES[dst]
    perm = [0] * 4
    for k in range(4):  # semantic dim k (N,H,W,C): dst position <- src
        perm[d[k]] = s[k]
    return tuple(perm)


def _pool_dims(size, stride, format: str):
    """reduce_window window/stride tuples for a 4-D tensor in `format`."""
    n, h, w, c = _FORMAT_AXES[format]
    win, st = [1] * 4, [1] * 4
    win[h], win[w] = size
    st[h], st[w] = stride
    return tuple(win), tuple(st)

# ---------------------------------------------------------------------------
# blas (lib/nnc/cmd/blas)
# ---------------------------------------------------------------------------

def gemm(a, w, bias=None, transpose_a=False, transpose_b=False):
    """CCV_NNC_GEMM_FORWARD: a @ w^T? — nnc convention stores weight rows as
    output features (cmd/blas/ccv_nnc_gemm_cpu_ref.c); here plain a @ w with
    optional transposes + bias."""
    x = a.T if transpose_a else a
    y = w.T if transpose_b else w
    out = jnp.matmul(x, y, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(a.dtype)


def add(a, b, p: float = 1.0, q: float = 1.0):
    """CCV_NNC_ADD_FORWARD: p*a + q*b (broadcasting)."""
    return p * a + q * b


def mul(a, b, p: float = 1.0):
    """CCV_NNC_MUL_FORWARD: p*a*b (broadcasting)."""
    return p * a * b


def scalar_mul(a, p: float):
    return p * a


def cmul(a, b):
    """CCV_NNC_CMUL_FORWARD: complex multiplication over interleaved pairs."""
    ar, ai = a[..., 0::2], a[..., 1::2]
    br, bi = b[..., 0::2], b[..., 1::2]
    re = ar * br - ai * bi
    im = ar * bi + ai * br
    out = jnp.stack([re, im], axis=-1)
    return out.reshape(a.shape)


# ---------------------------------------------------------------------------
# convolution (lib/nnc/cmd/convolution)
# ---------------------------------------------------------------------------

def conv2d(x, w, bias=None, stride=(1, 1), padding="SAME", dilation=(1, 1),
           groups: int = 1, precision=None, format: str = FORMAT_NHWC):
    """CCV_NNC_CONVOLUTION_FORWARD.

    `format` is the input/output tensor layout (NHWC default, NCHW/CHWN as
    in the reference's registry masks, ccv_nnc.h:45-49); the weight layout
    is always OHWI (the reference's CPU layout). XLA's dimension_numbers
    handle the layout natively — no transposes are materialized. On TPU
    this lowers straight onto the MXU; bf16 inputs stay bf16 with f32
    accumulation (preferred_element_type). `bias` is per-output-channel
    (broadcast along the format's C axis).
    """
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    (format, "OHWI", format))
    out = lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        rhs_dilation=dilation, dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=jnp.float32)
    if bias is not None:
        c_axis = _FORMAT_AXES[format][3]
        shape = [1] * 4
        shape[c_axis] = -1
        out = out + jnp.reshape(bias, shape)
    return out.astype(x.dtype)


def conv2d_transpose(x, w, bias=None, stride=(1, 1), padding="SAME",
                     dilation=(1, 1), groups: int = 1):
    """CCV_NNC_CONVOLUTION_TRANSPOSE_FORWARD (grouped: w is (O, kh, kw, I/g),
    inputs split channel-wise like the forward conv's group semantics)."""
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    dn = lax.conv_dimension_numbers(
        (x.shape[0], x.shape[1], x.shape[2], x.shape[3] // groups),
        w.shape if groups == 1 else (w.shape[0] // groups,) + w.shape[1:],
        ("NHWC", "OHWI", "NHWC"))
    if groups == 1:
        out = lax.conv_transpose(
            x, w, strides=stride, padding=padding,
            rhs_dilation=dilation, dimension_numbers=dn,
            transpose_kernel=True)
    else:
        xs = jnp.split(x, groups, axis=-1)
        ws = jnp.split(w, groups, axis=0)
        out = jnp.concatenate([
            lax.conv_transpose(xg, wg, strides=stride, padding=padding,
                               rhs_dilation=dilation, dimension_numbers=dn,
                               transpose_kernel=True)
            for xg, wg in zip(xs, ws)], axis=-1)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, negative_slope * x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def swish(x):
    return x * jax.nn.sigmoid(x)


def gelu(x, tanh_approx: bool = False):
    return jax.nn.gelu(x, approximate=tanh_approx)


def softmax(x, axis: int = -1):
    return jax.nn.softmax(x, axis=axis)


def dropout(x, rate: float, key, entirety: bool = False):
    """CCV_NNC_DROPOUT_FORWARD: inverted dropout; `entirety` drops the whole
    tensor with probability rate (cmd/dropout semantics)."""
    if entirety:
        keep = jax.random.bernoulli(key, 1.0 - rate)
        return jnp.where(keep, x / (1.0 - rate), 0.0)
    mask = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(mask, x / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# elementwise (lib/nnc/cmd/ew)
# ---------------------------------------------------------------------------

def ewsum(*xs):
    out = xs[0]
    for x in xs[1:]:
        out = out + x
    return out


def ewprod(*xs):
    out = xs[0]
    for x in xs[1:]:
        out = out * x
    return out


def ewdiv(a, b):
    return a / b


def ewexp(x):
    return jnp.exp(x)


def ewlog(x):
    return jnp.log(x)


def ewsqrt(x):
    return jnp.sqrt(x)


def ewabs(x):
    return jnp.abs(x)


def ewneg(x):
    return -x


def clamp(x, lo=None, hi=None):
    if lo is not None:
        x = jnp.maximum(x, lo)
    if hi is not None:
        x = jnp.minimum(x, hi)
    return x


def ewmin(a, b):
    """CCV_NNC_MIN_FORWARD (cmd/compare)."""
    return jnp.minimum(a, b)


def ewmax(a, b):
    """CCV_NNC_MAX_FORWARD (cmd/compare)."""
    return jnp.maximum(a, b)


# ---------------------------------------------------------------------------
# pooling (lib/nnc/cmd/pool)
# ---------------------------------------------------------------------------

def max_pool(x, size=(2, 2), stride=None, padding="VALID",
             format: str = FORMAT_NHWC):
    stride = stride or size
    win, st = _pool_dims(size, stride, format)
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max, win, st, padding)


def avg_pool(x, size=(2, 2), stride=None, padding="VALID",
             count_include_pad: bool = False, format: str = FORMAT_NHWC):
    stride = stride or size
    win, st = _pool_dims(size, stride, format)
    summed = lax.reduce_window(x.astype(jnp.float32), 0.0, lax.add,
                               win, st, padding)
    if count_include_pad or padding == "VALID":
        return (summed / (size[0] * size[1])).astype(x.dtype)
    counts = lax.reduce_window(jnp.ones_like(x, jnp.float32), 0.0, lax.add,
                               win, st, padding)
    return (summed / counts).astype(x.dtype)


# ---------------------------------------------------------------------------
# normalization (lib/nnc/cmd/norm)
# ---------------------------------------------------------------------------

def batch_norm(x, scale, bias, mean, var, epsilon: float = 1e-5,
               is_training: bool = False, momentum: float = 0.9,
               axis: Sequence[int] = (0, 1, 2),
               format: Optional[str] = None):
    """CCV_NNC_BATCH_NORM_FORWARD. Returns (y, new_mean, new_var) when
    training, else y. With `format` set, `axis` is derived as every axis
    but the format's channel axis, and scale/bias/mean/var broadcast along
    that channel axis (the reference's per-format registry semantics)."""
    if format is not None:
        c_axis = _FORMAT_AXES[format][3]
        axis = tuple(i for i in range(4) if i != c_axis)
        shape = [1] * 4
        shape[c_axis] = -1
        scale, bias = jnp.reshape(scale, shape), jnp.reshape(bias, shape)
        mean, var = jnp.reshape(mean, shape), jnp.reshape(var, shape)
        if is_training:
            xf = x.astype(jnp.float32)
            m = jnp.mean(xf, axis=axis, keepdims=True)
            v = jnp.var(xf, axis=axis, keepdims=True)
            y = (xf - m) * lax.rsqrt(v + epsilon) * scale + bias
            new_mean = momentum * mean + (1 - momentum) * m
            new_var = momentum * var + (1 - momentum) * v
            return (y.astype(x.dtype), new_mean.reshape(-1),
                    new_var.reshape(-1))
        y = (x.astype(jnp.float32) - mean) * lax.rsqrt(var + epsilon) \
            * scale + bias
        return y.astype(x.dtype)
    if is_training:
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, axis=tuple(axis))
        v = jnp.var(xf, axis=tuple(axis))
        y = (xf - m) * lax.rsqrt(v + epsilon) * scale + bias
        new_mean = momentum * mean + (1 - momentum) * m
        new_var = momentum * var + (1 - momentum) * v
        return y.astype(x.dtype), new_mean, new_var
    y = (x.astype(jnp.float32) - mean) * lax.rsqrt(var + epsilon) * scale + bias
    return y.astype(x.dtype)


def layer_norm(x, scale=None, bias=None, epsilon: float = 1e-5,
               axis: Sequence[int] = (-1,), elementwise_affine: bool = True):
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=tuple(axis), keepdims=True)
    v = jnp.var(xf, axis=tuple(axis), keepdims=True)
    y = (xf - m) * lax.rsqrt(v + epsilon)
    if elementwise_affine and scale is not None:
        y = y * scale
        if bias is not None:
            y = y + bias
    return y.astype(x.dtype)


def group_norm(x, scale=None, bias=None, groups: int = 32,
               epsilon: float = 1e-5, channel_axis: int = -1):
    xf = x.astype(jnp.float32)
    orig = xf.shape
    c = orig[channel_axis]
    assert c % groups == 0
    moved = jnp.moveaxis(xf, channel_axis, -1)
    g = moved.reshape(*moved.shape[:-1], groups, c // groups)
    red = tuple(range(1, g.ndim - 2)) + (g.ndim - 1,)
    m = jnp.mean(g, axis=red, keepdims=True)
    v = jnp.var(g, axis=red, keepdims=True)
    g = (g - m) * lax.rsqrt(v + epsilon)
    y = jnp.moveaxis(g.reshape(moved.shape), -1, channel_axis)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def rmsnorm(x, scale, epsilon: float = 1e-6, axis: Sequence[int] = (-1,)):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=tuple(axis), keepdims=True)
    return (xf * lax.rsqrt(ms + epsilon) * scale).astype(x.dtype)


# ---------------------------------------------------------------------------
# losses (lib/nnc/cmd/loss, softmax_loss, sigmoid_loss)
# ---------------------------------------------------------------------------

def mse_loss(x, y, reduce_mean: bool = True):
    d = (x - y) ** 2
    d = jnp.mean(d, axis=-1) if reduce_mean else jnp.sum(d, axis=-1)
    return d


def mae_loss(x, y, reduce_mean: bool = True):
    d = jnp.abs(x - y)
    return jnp.mean(d, axis=-1) if reduce_mean else jnp.sum(d, axis=-1)


def smooth_l1_loss(x, y, beta: float = 1.0):
    d = jnp.abs(x - y)
    out = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return jnp.sum(out, axis=-1)


def categorical_crossentropy(probs, labels, trim0: float = 0.0, trim1: float = 1.0):
    """CCV_NNC_CATEGORICAL_CROSSENTROPY_FORWARD on probabilities.

    Integer labels index classes (with optional label smoothing trim);
    float labels are soft targets."""
    logp = jnp.log(jnp.maximum(probs, 1e-12))
    if jnp.issubdtype(labels.dtype, jnp.integer):
        n = probs.shape[-1]
        if trim0 == 0.0 and trim1 == 1.0:
            return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        onehot = jax.nn.one_hot(labels, n) * (trim1 - trim0) + trim0
        return -jnp.sum(onehot * logp, axis=-1)
    return -jnp.sum(labels * logp, axis=-1)


def softmax_crossentropy(logits, labels, trim0: float = 0.0, trim1: float = 1.0):
    """CCV_NNC_SOFTMAX_CROSSENTROPY_FORWARD: fused, numerically stable.

    Returns (loss, softmax) like the reference (it outputs both)."""
    logz = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
    logp = logits - logz
    if jnp.issubdtype(labels.dtype, jnp.integer):
        if trim0 == 0.0 and trim1 == 1.0:
            loss = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        else:
            onehot = jax.nn.one_hot(labels, logits.shape[-1]) * (trim1 - trim0) + trim0
            loss = -jnp.sum(onehot * logp, axis=-1)
    else:
        loss = -jnp.sum(labels * logp, axis=-1)
    return loss, jnp.exp(logp)


def binary_crossentropy(probs, labels, pos_weight: float = 1.0):
    logp = jnp.log(jnp.maximum(probs, 1e-12))
    logn = jnp.log(jnp.maximum(1.0 - probs, 1e-12))
    out = -(pos_weight * labels * logp + (1 - labels) * logn)
    return jnp.sum(out, axis=-1)


def sigmoid_binary_crossentropy(logits, labels, pos_weight: float = 1.0):
    """CCV_NNC_SIGMOID_BINARY_CROSSENTROPY_FORWARD: fused and stable.
    Returns (loss, sigmoid)."""
    log_sig = jax.nn.log_sigmoid(logits)
    log_not = jax.nn.log_sigmoid(-logits)
    out = -(pos_weight * labels * log_sig + (1 - labels) * log_not)
    return jnp.sum(out, axis=-1), jax.nn.sigmoid(logits)


# ---------------------------------------------------------------------------
# reduce (lib/nnc/cmd/reduce)
# ---------------------------------------------------------------------------

def reduce_sum(x, axis, keepdims=True):
    return jnp.sum(x, axis=tuple(axis), keepdims=keepdims)


def reduce_mean(x, axis, keepdims=True):
    return jnp.mean(x, axis=tuple(axis), keepdims=keepdims)


def reduce_max(x, axis, keepdims=True):
    return jnp.max(x, axis=tuple(axis), keepdims=keepdims)


def reduce_min(x, axis, keepdims=True):
    return jnp.min(x, axis=tuple(axis), keepdims=keepdims)


def reduce_norm2(x, axis, keepdims=True):
    return jnp.sqrt(jnp.sum(x * x, axis=tuple(axis), keepdims=keepdims))


def argmax(x, axis=-1):
    return jnp.argmax(x, axis=axis)


def argmin(x, axis=-1):
    return jnp.argmin(x, axis=axis)


def reduce_isnan(x, axis, keepdims=True):
    """CCV_NNC_REDUCE_ISNAN_FORWARD: any-NaN reduction (cmd/isnan)."""
    return jnp.any(jnp.isnan(x), axis=tuple(axis), keepdims=keepdims)


# ---------------------------------------------------------------------------
# util / layout (lib/nnc/cmd/util, pad, index, upsample, histogram)
# ---------------------------------------------------------------------------

def format_transform(x, perm: Optional[Sequence[int]] = None,
                     src: Optional[str] = None, dst: Optional[str] = None):
    """CCV_NNC_FORMAT_TRANSFORM (cmd/util/ccv_nnc_util.c): relayout a 4-D
    tensor between the reference's named formats (NHWC/NCHW/CHWN,
    ccv_nnc.h:45-49), or apply an explicit axis permutation."""
    if perm is None:
        perm = format_perm(src, dst)
    return jnp.transpose(x, perm)


def transpose(x, axis_a: int = 0, axis_b: int = 1):
    """CCV_NNC_TRANSPOSE: swap two axes (cmd params transpose.axis[2])."""
    return jnp.swapaxes(x, axis_a, axis_b)


def data_transfer(x, device=None):
    """CCV_NNC_DATA_TRANSFER: host<->device / device<->device copy
    (lib/nnc/cmd/util — the memcpy/cudaMemcpy command). Under jax this is
    device_put; with no target it materializes on the default device."""
    return jax.device_put(x, device)


def datatype_conversion(x, dtype):
    return x.astype(dtype)


def set_(shape, value, dtype=jnp.float32):
    """CCV_NNC_SET_FORWARD."""
    return jnp.full(shape, value, dtype)


def masked_fill(x, mask, eq: float = 0.0, fill: float = 0.0):
    """CCV_NNC_MASKED_FILL_FORWARD: x where mask != eq else fill."""
    return jnp.where(mask == eq, fill, x)


def pad(x, begin: Sequence[int], end: Sequence[int], mode: str = "zero",
        value: float = 0.0):
    """CCV_NNC_PAD_FORWARD: zero or replicate padding."""
    widths = list(zip(begin, end))
    if mode == "zero":
        return jnp.pad(x, widths, constant_values=value)
    return jnp.pad(x, widths, mode="edge")


def index_select(x, indices, axis: int = 0):
    """CCV_NNC_INDEX_SELECT_FORWARD — also the embedding lookup."""
    return jnp.take(x, indices, axis=axis)


def upsample(x, hfactor: float = 2.0, wfactor: float = 2.0,
             mode: str = "bilinear", align_corners: bool = False):
    """CCV_NNC_UPSAMPLE_FORWARD (NHWC): nearest or bilinear."""
    n, h, w, c = x.shape
    nh, nw = int(h * hfactor), int(w * wfactor)
    method = "nearest" if mode == "nearest" else "bilinear"
    return jax.image.resize(x, (n, nh, nw, c), method=method)


def histogram(x, bins: int = 256, lo: float = 0.0, hi: float = 1.0):
    """CCV_NNC_HISTOGRAM_FORWARD (even-bin mode)."""
    idx = jnp.clip(((x - lo) / (hi - lo) * bins).astype(jnp.int32), 0, bins - 1)
    return jnp.bincount(idx.reshape(-1), length=bins)


# ---------------------------------------------------------------------------
# random (lib/nnc/cmd/rand)
# ---------------------------------------------------------------------------

def random_uniform(key, shape, lb: float = 0.0, ub: float = 1.0,
                   dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, lb, ub)


def random_normal(key, shape, std: float = 1.0, mean: float = 0.0,
                  dtype=jnp.float32):
    return mean + std * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# detection utilities (lib/nnc/cmd/nms, roi)
# ---------------------------------------------------------------------------

def nms(boxes, scores, iou_threshold: float = 0.5, max_out: Optional[int] = None):
    """CCV_NNC_NMS_FORWARD: greedy IoU suppression, static shapes.

    boxes (N, 4) as (x, y, w, h); returns (order, keep_mask) where order is
    score-descending indices (-1 past max_out) and keep_mask marks survivors.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    x1, y1 = b[:, 0], b[:, 1]
    x2, y2 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    area = b[:, 2] * b[:, 3]
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)
    suppressed_by = jnp.triu(iou > iou_threshold, k=1)  # [i, j]: i suppresses j

    def body(i, keep):
        row = suppressed_by[i] & keep[i]
        return keep & ~row

    keep = lax.fori_loop(0, n, body, jnp.ones(n, bool))
    return order, keep


def roi_align(x, rois, out_h: int, out_w: int, sampling_ratio: int = 2):
    """CCV_NNC_ROI_ALIGN_FORWARD (NHWC, rois as (N, 4) normalized x,y,w,h)."""
    h, w = x.shape[-3], x.shape[-2]

    def one_roi(roi):
        rx, ry, rw, rh = roi[0] * w, roi[1] * h, roi[2] * w, roi[3] * h
        ys = ry + (jnp.arange(out_h * sampling_ratio) + 0.5) * rh / (out_h * sampling_ratio)
        xs = rx + (jnp.arange(out_w * sampling_ratio) + 0.5) * rw / (out_w * sampling_ratio)
        y0 = jnp.clip(jnp.floor(ys - 0.5).astype(jnp.int32), 0, h - 1)
        x0 = jnp.clip(jnp.floor(xs - 0.5).astype(jnp.int32), 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        fy = jnp.clip(ys - 0.5 - y0, 0.0, 1.0)
        fx = jnp.clip(xs - 0.5 - x0, 0.0, 1.0)
        g = (x[..., y0, :, :][..., :, x0, :] * ((1 - fy)[:, None, None] * (1 - fx)[None, :, None])
             + x[..., y0, :, :][..., :, x1, :] * ((1 - fy)[:, None, None] * fx[None, :, None])
             + x[..., y1, :, :][..., :, x0, :] * (fy[:, None, None] * (1 - fx)[None, :, None])
             + x[..., y1, :, :][..., :, x1, :] * (fy[:, None, None] * fx[None, :, None]))
        g = g.reshape(out_h, sampling_ratio, out_w, sampling_ratio, -1)
        return jnp.mean(g, axis=(1, 3))

    return jax.vmap(one_roi)(rois)


# ---------------------------------------------------------------------------
# attention (lib/nnc/cmd/scaled_dot_product_attention)
# ---------------------------------------------------------------------------

def scaled_dot_product_attention(q, k, v, scale: Optional[float] = None,
                                 is_causal: bool = False, mask=None,
                                 bias=None):
    """CCV_NNC_SCALED_DOT_PRODUCT_ATTENTION_FORWARD (B, T, H, D layout).

    Plain XLA path; the Pallas flash-attention kernel
    (ccv_tpu.ops.pallas.flash_attention) overrides this on TPU for long T.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    if is_causal:
        tq, tk = logits.shape[-2], logits.shape[-1]
        causal = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        logits = jnp.where(causal, logits, -jnp.inf)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# rnn (lib/nnc/cmd/rnn: LSTM)
# ---------------------------------------------------------------------------

def lstm(x, w_ih, w_hh, b_ih=None, b_hh=None, h0=None, c0=None,
         reverse: bool = False):
    """CCV_NNC_LSTM_FORWARD, single layer. x: (T, B, I); returns (ys, hT, cT).

    Gates follow the cuDNN/nnc order [i, f, g, o]; the recurrence is a
    lax.scan so XLA pipelines the gemms.
    """
    T, B, _ = x.shape
    H = w_hh.shape[0]  # w_hh: (H, 4H)
    h0 = jnp.zeros((B, H), x.dtype) if h0 is None else h0
    c0 = jnp.zeros((B, H), x.dtype) if c0 is None else c0
    # precompute input projections for all timesteps in one MXU matmul
    xproj = jnp.einsum("tbi,ig->tbg", x, w_ih, preferred_element_type=jnp.float32)
    if b_ih is not None:
        xproj = xproj + b_ih
    if reverse:
        xproj = xproj[::-1]

    def step(carry, xp):
        h, c = carry
        gates = xp + jnp.einsum("bh,hg->bg", h, w_hh,
                                preferred_element_type=jnp.float32)
        if b_hh is not None:
            gates_ = gates + b_hh
        else:
            gates_ = gates
        i, f, g, o = jnp.split(gates_, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new.astype(x.dtype), c_new.astype(x.dtype)), h_new.astype(x.dtype)

    (hT, cT), ys = lax.scan(step, (h0, c0), xproj)
    if reverse:
        ys = ys[::-1]
    return ys, hT, cT
