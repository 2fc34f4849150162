"""VGG-D (VGG-16) — the reference's headline ImageNet model
(doc/convnet.rst: VGG-D top-1 31.96%, samples/image-net-2012-vgg-d).

Built from the CNNP layer zoo; bf16 activations/weights on the MXU with f32
accumulation is the TPU-native configuration (the reference ran fp32/fp16 on
CUDA). ``classify`` reproduces bin/cnnclassify's center-patch protocol.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ccv_tpu.nn import layers as L
from ccv_tpu.nn.model import Sequential

VGG_D_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]


def vgg_d(num_classes: int = 1000, include_top: bool = True,
          name: str = "vgg-d") -> Sequential:
    stack = []
    i = 0
    for c in VGG_D_CFG:
        if c == "M":
            stack.append(L.MaxPool((2, 2)))
        else:
            stack.append(L.Convolution(c, (3, 3), padding="SAME",
                                       name=f"conv{i}"))
            stack.append(L.ReLU())
            i += 1
    if include_top:
        stack += [
            L.Flatten(),
            L.Dense(4096, name="fc6"), L.ReLU(), L.Dropout(0.5),
            L.Dense(4096, name="fc7"), L.ReLU(), L.Dropout(0.5),
            L.Dense(num_classes, name="fc8"),
        ]
    return Sequential(stack, name=name)


def preprocess(img_u8, mean_rgb=(123.68, 116.779, 103.939)):
    """Center 224-crop + mean subtraction (cnnclassify's center patch)."""
    x = img_u8.astype(jnp.float32)
    h, w = x.shape[-3], x.shape[-2]
    y0, x0 = (h - 224) // 2, (w - 224) // 2
    x = x[..., y0:y0 + 224, x0:x0 + 224, :]
    return x - jnp.asarray(mean_rgb)


def classify(model: Sequential, img_u8, top: int = 5):
    """bin/cnnclassify twin: returns (top indices, softmax scores)."""
    x = preprocess(img_u8)
    if x.ndim == 3:
        x = x[None]
    logits = model.evaluate(x)
    probs = jax.nn.softmax(logits, axis=-1)
    idx = jnp.argsort(-probs, axis=-1)[..., :top]
    return idx, jnp.take_along_axis(probs, idx, axis=-1)
