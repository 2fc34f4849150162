"""ccv_convnet twin (reference: lib/ccv_convnet.c) — the legacy CNN API.

Layer types mirror the reference enum (convolutional / full_connect /
max_pool / average_pool / local_response_norm, lib/ccv.h ccv_convnet_layer)
including LRN, which the modern stack dropped. ``matt_net`` builds the
AlexNet-12 variant the reference benchmarks (doc/convnet.rst:79-81).

classify() implements the center+corners x flips 10-patch protocol of
ccv_convnet_classify (ccv_convnet.c:723) with symmetric averaging.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ccv_tpu.nn import layers as L, ops
from ccv_tpu.nn.model import Sequential
from ccv_tpu.nn.layers import Layer


class LocalResponseNorm(Layer):
    """CCV_CONVNET_LOCAL_RESPONSE_NORM: x / (kappa + alpha*sum x^2)^beta
    over a `size`-wide channel window (ccv_convnet.c forward pass)."""

    def __init__(self, size: int = 5, kappa: float = 2.0, alpha: float = 1e-4,
                 beta: float = 0.75, name: str = "lrn"):
        self.size = size
        self.kappa = kappa
        self.alpha = alpha
        self.beta = beta
        self.name = name

    def init(self, key, in_shape):
        return {}, {}, in_shape

    def apply(self, params, state, x, training=False, key=None):
        xf = x.astype(jnp.float32)
        sq = xf * xf
        half = self.size // 2
        padded = jnp.pad(sq, [(0, 0)] * (x.ndim - 1) + [(half, half)])
        acc = sum(
            jax.lax.dynamic_slice_in_dim(padded, k, x.shape[-1], axis=x.ndim - 1)
            for k in range(self.size))
        y = xf / jnp.power(self.kappa + self.alpha * acc, self.beta)
        return y.astype(x.dtype), state


def matt_net(num_classes: int = 1000) -> Sequential:
    """AlexNet-12/"MattNet" shape (ccv_convnet benchmark config)."""
    return Sequential([
        L.Convolution(96, (11, 11), stride=(4, 4), padding="VALID", name="conv1"),
        L.ReLU(),
        LocalResponseNorm(),
        L.MaxPool((3, 3), (2, 2)),
        L.Convolution(256, (5, 5), padding="SAME", name="conv2"),
        L.ReLU(),
        LocalResponseNorm(),
        L.MaxPool((3, 3), (2, 2)),
        L.Convolution(384, (3, 3), padding="SAME", name="conv3"),
        L.ReLU(),
        L.Convolution(384, (3, 3), padding="SAME", name="conv4"),
        L.ReLU(),
        L.Convolution(256, (3, 3), padding="SAME", name="conv5"),
        L.ReLU(),
        L.MaxPool((3, 3), (2, 2)),
        L.Flatten(),
        L.Dense(4096, name="fc6"), L.ReLU(), L.Dropout(0.5),
        L.Dense(4096, name="fc7"), L.ReLU(), L.Dropout(0.5),
        L.Dense(num_classes, name="fc8"),
    ], name="matt-net")


def ten_patches(img, patch: int = 224):
    """center + 4 corners, and their horizontal mirrors (ccv_convnet.c:723)."""
    h, w = img.shape[-3], img.shape[-2]
    ys = [0, 0, (h - patch) // 2, h - patch, h - patch]
    xs = [0, w - patch, (w - patch) // 2, 0, w - patch]
    crops = [img[..., y:y + patch, x:x + patch, :] for y, x in zip(ys, xs)]
    crops += [jnp.flip(c, axis=-2) for c in crops]
    return jnp.stack(crops)


def classify(model: Sequential, img_u8, top: int = 5, patch: int = 224,
             mean_rgb=(123.68, 116.779, 103.939)):
    x = img_u8.astype(jnp.float32) - jnp.asarray(mean_rgb)
    patches = ten_patches(x, patch)
    logits = model.evaluate(patches)
    probs = jax.nn.softmax(logits, axis=-1).mean(axis=0)
    idx = jnp.argsort(-probs)[:top]
    return idx, probs[idx]
