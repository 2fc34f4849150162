"""CNNP layer zoo (reference: lib/nnc/ccv_cnnp_model_addons.c, ~70 ctors).

A layer is a small stateless object with
``init(key, in_shape) -> (params, state, out_shape)`` and
``apply(params, state, x, training, key) -> (y, new_state)``; composition
happens in ``ccv_tpu.nn.model``. Everything is jit/vmap/grad-friendly: params
and state are pytrees of jax arrays; shapes are computed eagerly at build
time exactly like CNNP's shape inference at model compile.

Initialization matches the reference's defaults: conv/dense use
Glorot-uniform (ccv_cnnp_model_addons.c uses GLOROT by default).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.nn import ops


class Layer:
    name: str = "layer"

    def init(self, key, in_shape):
        return {}, {}, in_shape

    def apply(self, params, state, x, training=False, key=None):
        raise NotImplementedError

    def __repr__(self):
        return f"{type(self).__name__}"


def _glorot(key, shape, fan_in, fan_out, dtype=jnp.float32):
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


class Dense(Layer):
    """ccv_cnnp_dense (model_addons.c:1421)."""

    def __init__(self, count: int, no_bias: bool = False, name: str = "dense"):
        self.count = count
        self.no_bias = no_bias
        self.name = name

    def init(self, key, in_shape):
        d = in_shape[-1]
        k1, _ = jax.random.split(key)
        params = {"w": _glorot(k1, (d, self.count), d, self.count)}
        if not self.no_bias:
            params["b"] = jnp.zeros((self.count,))
        return params, {}, (*in_shape[:-1], self.count)

    def apply(self, params, state, x, training=False, key=None):
        y = jnp.matmul(x, params["w"].astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        if "b" in params:
            y = y + params["b"].astype(x.dtype)
        return y, state


class Convolution(Layer):
    """ccv_cnnp_convolution (model_addons.c:1180). NHWC; filters OHWI."""

    def __init__(self, filters: int, kernel=(3, 3), stride=(1, 1),
                 padding="SAME", dilation=(1, 1), groups: int = 1,
                 no_bias: bool = False, name: str = "conv"):
        self.filters = filters
        self.kernel = tuple(kernel)
        self.stride = tuple(stride)
        self.padding = padding
        self.dilation = tuple(dilation)
        self.groups = groups
        self.no_bias = no_bias
        self.name = name

    def init(self, key, in_shape):
        cin = in_shape[-1]
        kh, kw = self.kernel
        fan_in = kh * kw * cin // self.groups
        fan_out = kh * kw * self.filters // self.groups
        w = _glorot(key, (self.filters, kh, kw, cin // self.groups), fan_in, fan_out)
        params = {"w": w}
        if not self.no_bias:
            params["b"] = jnp.zeros((self.filters,))
        dummy = jax.eval_shape(
            lambda x, w: ops.conv2d(x, w, stride=self.stride, padding=self.padding,
                                    dilation=self.dilation, groups=self.groups),
            jax.ShapeDtypeStruct((1, *in_shape[-3:]), jnp.float32),
            jax.ShapeDtypeStruct(w.shape, jnp.float32))
        return params, {}, (*in_shape[:-3], *dummy.shape[1:])

    def apply(self, params, state, x, training=False, key=None):
        y = ops.conv2d(x, params["w"].astype(x.dtype),
                       params.get("b", None) if params.get("b") is None else params["b"].astype(x.dtype),
                       stride=self.stride, padding=self.padding,
                       dilation=self.dilation, groups=self.groups)
        return y, state


class ConvolutionTranspose(Layer):
    """ccv_cnnp_convolution_transpose (model_addons.c:1309)."""

    def __init__(self, filters: int, kernel=(3, 3), stride=(2, 2),
                 padding="SAME", no_bias: bool = False, name: str = "convT"):
        self.filters = filters
        self.kernel = tuple(kernel)
        self.stride = tuple(stride)
        self.padding = padding
        self.no_bias = no_bias
        self.name = name

    def init(self, key, in_shape):
        cin = in_shape[-1]
        kh, kw = self.kernel
        w = _glorot(key, (self.filters, kh, kw, cin), kh * kw * cin,
                    kh * kw * self.filters)
        params = {"w": w}
        if not self.no_bias:
            params["b"] = jnp.zeros((self.filters,))
        dummy = jax.eval_shape(
            lambda x, w: ops.conv2d_transpose(x, w, stride=self.stride,
                                              padding=self.padding),
            jax.ShapeDtypeStruct((1, *in_shape[-3:]), jnp.float32),
            jax.ShapeDtypeStruct(w.shape, jnp.float32))
        return params, {}, (*in_shape[:-3], *dummy.shape[1:])

    def apply(self, params, state, x, training=False, key=None):
        b = params["b"].astype(x.dtype) if "b" in params else None
        y = ops.conv2d_transpose(x, params["w"].astype(x.dtype), b,
                                 stride=self.stride, padding=self.padding)
        return y, state


class BatchNorm(Layer):
    """ccv_cnnp_batch_norm. State carries running mean/var."""

    def __init__(self, momentum: float = 0.9, epsilon: float = 1e-5,
                 name: str = "bn"):
        self.momentum = momentum
        self.epsilon = epsilon
        self.name = name

    def init(self, key, in_shape):
        c = in_shape[-1]
        params = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
        state = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
        return params, state, in_shape

    def apply(self, params, state, x, training=False, key=None):
        axes = tuple(range(x.ndim - 1))
        if training:
            y, new_mean, new_var = ops.batch_norm(
                x, params["scale"], params["bias"], state["mean"],
                state["var"], self.epsilon, is_training=True,
                momentum=self.momentum, axis=axes)
            return y, {"mean": new_mean, "var": new_var}
        y = ops.batch_norm(x, params["scale"], params["bias"], state["mean"],
                           state["var"], self.epsilon, axis=axes)
        return y, state


class LayerNorm(Layer):
    def __init__(self, epsilon: float = 1e-5, axis=(-1,),
                 elementwise_affine: bool = True, name: str = "ln"):
        self.epsilon = epsilon
        self.axis = tuple(axis)
        self.affine = elementwise_affine
        self.name = name

    def init(self, key, in_shape):
        if not self.affine:
            return {}, {}, in_shape
        shape = tuple(in_shape[a] for a in self.axis)
        return {"scale": jnp.ones(shape), "bias": jnp.zeros(shape)}, {}, in_shape

    def apply(self, params, state, x, training=False, key=None):
        return ops.layer_norm(x, params.get("scale"), params.get("bias"),
                              self.epsilon, self.axis, self.affine), state


class GroupNorm(Layer):
    def __init__(self, groups: int = 32, epsilon: float = 1e-5, name: str = "gn"):
        self.groups = groups
        self.epsilon = epsilon
        self.name = name

    def init(self, key, in_shape):
        c = in_shape[-1]
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}, {}, in_shape

    def apply(self, params, state, x, training=False, key=None):
        return ops.group_norm(x, params["scale"], params["bias"],
                              self.groups, self.epsilon), state


class RMSNorm(Layer):
    def __init__(self, epsilon: float = 1e-6, name: str = "rmsnorm"):
        self.epsilon = epsilon
        self.name = name

    def init(self, key, in_shape):
        return {"scale": jnp.ones((in_shape[-1],))}, {}, in_shape

    def apply(self, params, state, x, training=False, key=None):
        return ops.rmsnorm(x, params["scale"], self.epsilon), state


class Embedding(Layer):
    """ccv_cnnp_embedding: index_select over a learned table."""

    def __init__(self, vocab: int, dim: int, name: str = "embedding"):
        self.vocab = vocab
        self.dim = dim
        self.name = name

    def init(self, key, in_shape):
        table = jax.random.normal(key, (self.vocab, self.dim)) * 0.02
        return {"table": table}, {}, (*in_shape, self.dim)

    def apply(self, params, state, x, training=False, key=None):
        return jnp.take(params["table"], x, axis=0), state


class _Stateless(Layer):
    def __init__(self, fn: Callable, shape_fn=None, name: str = "fn"):
        self.fn = fn
        self.shape_fn = shape_fn
        self.name = name

    def init(self, key, in_shape):
        if self.shape_fn is not None:
            return {}, {}, self.shape_fn(in_shape)
        out = jax.eval_shape(self.fn, jax.ShapeDtypeStruct(in_shape, jnp.float32))
        return {}, {}, out.shape

    def apply(self, params, state, x, training=False, key=None):
        return self.fn(x), state


def ReLU():
    return _Stateless(ops.relu, lambda s: s, "relu")


def LeakyReLU(slope=0.01):
    return _Stateless(lambda x: ops.leaky_relu(x, slope), lambda s: s, "leaky_relu")


def Sigmoid():
    return _Stateless(ops.sigmoid, lambda s: s, "sigmoid")


def Tanh():
    return _Stateless(ops.tanh, lambda s: s, "tanh")


def Swish():
    return _Stateless(ops.swish, lambda s: s, "swish")


def GELU(tanh_approx=False):
    return _Stateless(lambda x: ops.gelu(x, tanh_approx), lambda s: s, "gelu")


def Softmax():
    return _Stateless(ops.softmax, lambda s: s, "softmax")


def MaxPool(size=(2, 2), stride=None, padding="VALID"):
    return _Stateless(lambda x: ops.max_pool(x, size, stride, padding),
                      name="max_pool")


def AvgPool(size=(2, 2), stride=None, padding="VALID"):
    return _Stateless(lambda x: ops.avg_pool(x, size, stride, padding),
                      name="avg_pool")


def Flatten():
    return _Stateless(lambda x: x.reshape(x.shape[0], -1),
                      lambda s: (s[0], int(np.prod(s[1:]))), "flatten")


def Reshape(shape: Sequence[int]):
    return _Stateless(lambda x: x.reshape(x.shape[0], *shape),
                      lambda s: (s[0], *shape), "reshape")


def Permute(perm: Sequence[int]):
    return _Stateless(lambda x: jnp.transpose(x, perm),
                      lambda s: tuple(s[p] for p in perm), "permute")


def Transpose(axis_a: int, axis_b: int):
    """ccv_cnnp_transpose twin (ccv_nnc.h:4513): swap two axes."""

    def shape(s):
        t = list(s)
        t[axis_a], t[axis_b] = t[axis_b], t[axis_a]
        return tuple(t)

    return _Stateless(lambda x: jnp.swapaxes(x, axis_a, axis_b), shape,
                      "transpose")


def Pad(begin, end, mode="zero"):
    return _Stateless(lambda x: ops.pad(x, begin, end, mode), name="pad")


def Upsample(hfactor=2.0, wfactor=2.0, mode="bilinear"):
    return _Stateless(lambda x: ops.upsample(x, hfactor, wfactor, mode),
                      name="upsample")


def Identity():
    return _Stateless(lambda x: x, lambda s: s, "identity")


class Dropout(Layer):
    def __init__(self, rate: float, name: str = "dropout"):
        self.rate = rate
        self.name = name

    def apply(self, params, state, x, training=False, key=None):
        if not training or self.rate == 0.0:
            return x, state
        return ops.dropout(x, self.rate, key), state


class LSTM(Layer):
    """ccv_cnnp_lstm (model_addons.c:3460), single layer batch-first.

    Input (B, T, I) -> output (B, T, H)."""

    def __init__(self, hidden: int, bidirectional: bool = False,
                 name: str = "lstm"):
        self.hidden = hidden
        self.bidirectional = bidirectional
        self.name = name

    def init(self, key, in_shape):
        i = in_shape[-1]
        h = self.hidden
        keys = jax.random.split(key, 4)
        params = {
            "w_ih": _glorot(keys[0], (i, 4 * h), i, 4 * h),
            "w_hh": _glorot(keys[1], (h, 4 * h), h, 4 * h),
            "b_ih": jnp.zeros((4 * h,)),
            "b_hh": jnp.zeros((4 * h,)),
        }
        if self.bidirectional:
            params.update({
                "w_ih_r": _glorot(keys[2], (i, 4 * h), i, 4 * h),
                "w_hh_r": _glorot(keys[3], (h, 4 * h), h, 4 * h),
                "b_ih_r": jnp.zeros((4 * h,)),
                "b_hh_r": jnp.zeros((4 * h,)),
            })
        out = (*in_shape[:-1], h * (2 if self.bidirectional else 1))
        return params, {}, out

    def apply(self, params, state, x, training=False, key=None):
        xt = jnp.swapaxes(x, 0, 1)  # (T, B, I)
        ys, _, _ = ops.lstm(xt, params["w_ih"], params["w_hh"],
                            params["b_ih"], params["b_hh"])
        out = jnp.swapaxes(ys, 0, 1)
        if self.bidirectional:
            ys_r, _, _ = ops.lstm(xt, params["w_ih_r"], params["w_hh_r"],
                                  params["b_ih_r"], params["b_hh_r"],
                                  reverse=True)
            out = jnp.concatenate([out, jnp.swapaxes(ys_r, 0, 1)], axis=-1)
        return out, state


class ScaledDotProductAttention(Layer):
    """ccv_cnnp_scaled_dot_product_attention (model_addons.c:3979) with the
    optional fused-QKV projection. Input (B, T, D)."""

    def __init__(self, heads: int, dim: int, is_causal: bool = False,
                 fused_qkv: bool = True, out_proj: bool = True,
                 name: str = "attention"):
        self.heads = heads
        self.dim = dim  # per-head dim
        self.is_causal = is_causal
        self.fused_qkv = fused_qkv
        self.out_proj = out_proj
        self.name = name

    def init(self, key, in_shape):
        d = in_shape[-1]
        inner = self.heads * self.dim
        keys = jax.random.split(key, 4)
        params = {}
        if self.fused_qkv:
            params["wqkv"] = _glorot(keys[0], (d, 3 * inner), d, 3 * inner)
        else:
            params["wq"] = _glorot(keys[0], (d, inner), d, inner)
            params["wk"] = _glorot(keys[1], (d, inner), d, inner)
            params["wv"] = _glorot(keys[2], (d, inner), d, inner)
        out_d = d
        if self.out_proj:
            params["wo"] = _glorot(keys[3], (inner, d), inner, d)
        else:
            out_d = inner
        return params, {}, (*in_shape[:-1], out_d)

    def apply(self, params, state, x, training=False, key=None):
        B, T, D = x.shape
        inner = self.heads * self.dim
        if self.fused_qkv:
            qkv = jnp.matmul(x, params["wqkv"].astype(x.dtype),
                             preferred_element_type=jnp.float32).astype(x.dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = x @ params["wq"].astype(x.dtype)
            k = x @ params["wk"].astype(x.dtype)
            v = x @ params["wv"].astype(x.dtype)
        q = q.reshape(B, T, self.heads, self.dim)
        k = k.reshape(B, T, self.heads, self.dim)
        v = v.reshape(B, T, self.heads, self.dim)
        from ccv_tpu.utils import flags as _flags

        if (jax.default_backend() != "cpu" and T >= 1024
                and not _flags.is_set(_flags.DISABLE_PALLAS_FLASH_ATTENTION)):
            # long sequences: the Pallas flash kernel (scores never hit HBM)
            from ccv_tpu.ops.pallas import flash_attention

            out = flash_attention(q, k, v, None, self.is_causal)
        else:
            out = ops.scaled_dot_product_attention(
                q, k, v, is_causal=self.is_causal)
        out = out.reshape(B, T, inner)
        if self.out_proj:
            out = jnp.matmul(out, params["wo"].astype(x.dtype),
                             preferred_element_type=jnp.float32).astype(x.dtype)
        return out, state
