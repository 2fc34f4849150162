"""ResNet50-v1d + FPN backbone and RPN head — twin of the reference's
COCO example topology (bin/nnc/coco.c:18-177: `_resnet_block_new`,
`_resnet_block_layer_new`, `_imagenet_resnet50_v1d_fpn`,
`_coco_resnet50_v1d_rpn`).

Built on the CNNP-twin graph Model API (nn/functional.Model): the v1d
stem (three 3x3 convs), bottleneck blocks with the avg-pool-downsample
projection shortcut, FPN lateral 1x1 + bilinear-up + 3x3 smoothing to
P2..P5, P6 = avg-pool(P5). The RPN head is the reference's single 1x1
conv producing 3 anchors x (objectness + 4 box) = 15 channels, with ONE
weight set shared across all five pyramid levels (kept functional here —
the graph API keys parameters per node, so sharing is explicit instead).

bf16 activations on the MXU; batch norm in f32 (layers.BatchNorm).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ccv_tpu.nn import layers as L
from ccv_tpu.nn import ops
from ccv_tpu.nn.functional import Add, Input, Model

FPN_DIM = 256
RPN_CHANNELS = 15  # 3 aspect ratios x (1 objectness + 4 box)


def _bn():
    # coco.c: ccv_cnnp_batch_norm(0.9, 1e-4, 1, 0)
    return L.BatchNorm(momentum=0.9, epsilon=1e-4)


def _block(x, filters: int, expansion: int, strides: int,
           projection_shortcut: bool):
    """coco.c:18 `_resnet_block_new` (v1d bottleneck)."""
    shortcut = x
    if projection_shortcut:
        if strides > 1:
            shortcut = L.AvgPool((strides, strides))(shortcut)
        shortcut = L.Convolution(filters * expansion, (1, 1),
                                 padding="VALID")(shortcut)
    y = L.Convolution(filters, (1, 1), padding="VALID", no_bias=True)(x)
    y = _bn()(y)
    y = L.ReLU()(y)
    y = L.Convolution(filters, (3, 3), stride=(strides, strides),
                      padding="SAME", no_bias=True)(y)
    y = _bn()(y)
    y = L.ReLU()(y)
    y = L.Convolution(filters * expansion, (1, 1), padding="VALID",
                      no_bias=True)(y)
    y = _bn()(y)
    out = Add()(y, shortcut)
    return L.ReLU()(out)


def _block_layer(x, filters: int, expansion: int, strides: int,
                 blocks: int):
    """coco.c:57 `_resnet_block_layer_new`."""
    x = _block(x, filters, expansion, strides, True)
    for _ in range(blocks - 1):
        x = _block(x, filters, expansion, 1, False)
    return x


def _fpn(c: List[Any], d: int = FPN_DIM) -> List[Any]:
    """coco.c:110 `_fpn`: top-down lateral merge."""
    p = [None] * len(c)
    out = L.Convolution(d, (1, 1), padding="VALID")(c[-1])
    p[-1] = out
    for i in range(len(c) - 2, -1, -1):
        lateral = L.Convolution(d, (1, 1), padding="VALID")(c[i])
        up = L.Upsample(2.0, 2.0, mode="bilinear")(out)
        s = Add()(lateral, up)
        out = L.Convolution(d, (3, 3), padding="SAME")(s)
        p[i] = out
    return p


def resnet50_v1d_fpn() -> Model:
    """coco.c:125 `_imagenet_resnet50_v1d_fpn`: input -> [P2..P6].

    P2..P5 strides 4/8/16/32; P6 = 2x2 avg-pool of P5 (stride 64).
    """
    inp = Input()
    x = L.Convolution(32, (3, 3), stride=(2, 2), padding="SAME",
                      no_bias=True)(inp)
    x = _bn()(x)
    x = L.ReLU()(x)
    x = L.Convolution(32, (3, 3), padding="SAME", no_bias=True)(x)
    x = _bn()(x)
    x = L.ReLU()(x)
    x = L.Convolution(64, (3, 3), padding="SAME", no_bias=True)(x)
    x = _bn()(x)
    x = L.ReLU()(x)
    x = L.MaxPool((3, 3), stride=(2, 2), padding="SAME")(x)
    c2 = _block_layer(x, 64, 4, 1, 3)
    c3 = _block_layer(c2, 128, 4, 2, 4)
    c4 = _block_layer(c3, 256, 4, 2, 6)
    c5 = _block_layer(c4, 512, 4, 2, 3)
    p = _fpn([c2, c3, c4, c5])
    p6 = L.AvgPool((2, 2))(p[3])
    return Model([inp], p + [p6], name="resnet50-v1d-fpn")


def rpn_init(key, d: int = FPN_DIM) -> Dict[str, jnp.ndarray]:
    """coco.c:168 `_coco_resnet50_v1d_rpn`: ONE 1x1 conv shared by all
    five levels (weight sharing is explicit — a functional params dict
    applied per level)."""
    wkey, _ = jax.random.split(key)
    # 0.01-std init (standard RPN practice): keeps the box-regression
    # logits small enough for from-scratch smooth-L1 training
    w = jax.random.normal(wkey, (RPN_CHANNELS, 1, 1, d)) * 0.01
    return {"w": w, "b": jnp.zeros((RPN_CHANNELS,))}


def rpn_apply(params, p_levels):
    """Apply the shared RPN conv to each pyramid level.

    Returns per-level (B, H, W, 15) proposal maps."""
    outs = []
    for p in p_levels:
        w = params["w"].astype(p.dtype)
        b = params["b"].astype(p.dtype)
        outs.append(ops.conv2d(p, w, b, stride=(1, 1), padding="VALID"))
    return outs
