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


# ---------------------------------------------------------------------------
# Reference wire-format convnet (ccv_convnet.c SQLite schema)
# ---------------------------------------------------------------------------

import dataclasses
import sqlite3 as _sqlite3

import numpy as np

CONVOLUTIONAL = 0x01
FULL_CONNECT = 0x02
MAX_POOL = 0x03
AVERAGE_POOL = 0x04
LOCAL_RESPONSE_NORM = 0x05


@dataclasses.dataclass
class ConvnetLayer:
    """ccv_convnet_layer_t twin: the tagged-union params + weights."""

    type: int
    in_rows: int
    in_cols: int
    in_channels: int
    in_partition: int
    node_count: int
    # convolutional
    rows: int = 0
    cols: int = 0
    channels: int = 0
    partition: int = 1
    count: int = 0
    strides: int = 1
    border: int = 0
    # pool / rnorm
    size: int = 0
    kappa: float = 0.0
    alpha: float = 0.0
    beta: float = 0.0
    relu: int = 0
    w: Optional[np.ndarray] = None      # conv: (count, kr, kc, ch/part); fc: (count, in)
    bias: Optional[np.ndarray] = None   # (count,)

    def out_shape(self, in_rows: int, in_cols: int):
        """ccv_convnet_make_output twin (inc/ccv_convnet_internal.h:4)."""
        if self.type == CONVOLUTIONAL:
            r = (in_rows + self.border * 2 - self.rows
                 + self.strides - 1) // self.strides + 1
            c = (in_cols + self.border * 2 - self.cols
                 + self.strides - 1) // self.strides + 1
            return r, c
        if self.type == FULL_CONNECT:
            return self.count, 1
        if self.type in (MAX_POOL, AVERAGE_POOL):
            r = (in_rows + self.border * 2 - self.size
                 + self.strides - 1) // self.strides + 1
            c = (in_cols + self.border * 2 - self.size
                 + self.strides - 1) // self.strides + 1
            return r, c
        return in_rows, in_cols


def _layer_forward(layer: ConvnetLayer, x: jax.Array) -> jax.Array:
    """One layer on an NHWC float32 batch; exact twin of
    _ccv_convnet_layer_forward_propagate (ccv_convnet.c:578)."""
    if layer.type == CONVOLUTIONAL:
        # weights (count, kr, kc, ch_per_partition) -> HWIO per partition
        w = jnp.asarray(layer.w)
        parts = layer.partition
        outs = []
        ch_pp = layer.channels // parts
        cnt_pp = layer.count // parts
        for p in range(parts):
            xp = x[..., p * ch_pp:(p + 1) * ch_pp]
            wp = w[p * cnt_pp:(p + 1) * cnt_pp].transpose(1, 2, 3, 0)
            outs.append(jax.lax.conv_general_dilated(
                xp, wp, window_strides=(layer.strides, layer.strides),
                padding=[(layer.border, layer.border)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST))
        y = jnp.concatenate(outs, axis=-1) + jnp.asarray(layer.bias)
        return jnp.maximum(y, 0.0)  # conv always applies ReLU (ccv_convnet.c:382)
    if layer.type == FULL_CONNECT:
        flat = x.reshape(x.shape[0], -1)  # HWC row-major, like the reference
        y = jnp.matmul(flat, jnp.asarray(layer.w).T,
                       precision=jax.lax.Precision.HIGHEST) \
            + jnp.asarray(layer.bias)
        return jnp.maximum(y, 0.0) if layer.relu else y
    if layer.type in (MAX_POOL, AVERAGE_POOL):
        # the reference's output size ceils ((in+2b-size+stride-1)//stride+1,
        # inc/ccv_convnet_internal.h): windows may overhang the right/bottom
        # edge; overhanging cells read nothing (max) / divide by the actual
        # overlap (avg, ccv_convnet.c:556-562)
        H, W = x.shape[1], x.shape[2]
        out_r = (H + 2 * layer.border - layer.size
                 + layer.strides - 1) // layer.strides + 1
        out_c = (W + 2 * layer.border - layer.size
                 + layer.strides - 1) // layer.strides + 1
        eh = max(0, (out_r - 1) * layer.strides + layer.size
                 - 2 * layer.border - H)
        ew = max(0, (out_c - 1) * layer.strides + layer.size
                 - 2 * layer.border - W)
        pad = [(0, 0), (layer.border, layer.border + eh),
               (layer.border, layer.border + ew), (0, 0)]
        dims = (1, layer.size, layer.size, 1)
        strides = (1, layer.strides, layer.strides, 1)
        if layer.type == MAX_POOL:
            return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims,
                                         strides, pad)
        ones = jnp.ones(x.shape[1:3] + (1,), x.dtype)[None]
        s = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pad)
        n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, pad)
        return s / n
    if layer.type == LOCAL_RESPONSE_NORM:
        parts = layer.in_partition
        ch_pp = layer.in_channels // parts
        half = layer.size // 2
        outs = []
        for p in range(parts):
            xp = x[..., p * ch_pp:(p + 1) * ch_pp]
            sq = xp * xp
            padded = jnp.pad(sq, [(0, 0)] * 3 + [(half, half)])
            acc = sum(jax.lax.dynamic_slice_in_dim(padded, k, ch_pp, axis=3)
                      for k in range(layer.size))
            outs.append(xp * jnp.power(layer.kappa + layer.alpha * acc,
                                       -layer.beta))
        return jnp.concatenate(outs, axis=-1)
    raise ValueError(f"unknown layer type {layer.type}")


class Convnet:
    """ccv_convnet_t twin with the reference's SQLite wire format
    (ccv_convnet_read/write, ccv_convnet.c:1412/:1534)."""

    def __init__(self, layers: Sequence[ConvnetLayer], input_size,
                 mean_activity: Optional[np.ndarray] = None):
        self.layers = list(layers)
        self.input_size = tuple(input_size)  # (height, width)
        self.mean_activity = mean_activity
        self._encode = jax.jit(self._encode_impl)

    @property
    def rows(self):
        return self.layers[0].in_rows

    @property
    def cols(self):
        return self.layers[0].in_cols

    @property
    def channels(self):
        return self.layers[0].in_channels

    @classmethod
    def read(cls, path: str) -> "Convnet":
        """ccv_convnet_read twin: reference SQLite schema, incl.
        half-precision weight blobs."""
        con = _sqlite3.connect(path)
        rows = con.execute(
            "SELECT layer, type, input_matrix_rows, input_matrix_cols,"
            " input_matrix_channels, input_matrix_partition, input_node_count,"
            " output_rows, output_cols, output_channels, output_partition,"
            " output_count, output_strides, output_border, output_size,"
            " output_kappa, output_alpha, output_beta, output_relu"
            " FROM layer_params ORDER BY layer ASC").fetchall()
        layers = []
        for r in rows:
            (_, t, imr, imc, imch, imp, inc_, orows, ocols, och, opart,
             ocount, ostrides, oborder, osize, okappa, oalpha, obeta,
             orelu) = r
            lay = ConvnetLayer(type=t, in_rows=imr, in_cols=imc,
                               in_channels=imch, in_partition=imp,
                               node_count=inc_)
            if t == CONVOLUTIONAL:
                lay.rows, lay.cols, lay.channels = orows, ocols, och
                lay.partition, lay.count = opart, ocount
                lay.strides, lay.border = ostrides, oborder
            elif t == FULL_CONNECT:
                lay.count = ocount
                lay.relu = orelu
            elif t in (MAX_POOL, AVERAGE_POOL):
                lay.strides, lay.border, lay.size = ostrides, oborder, osize
            elif t == LOCAL_RESPONSE_NORM:
                lay.size = osize
                lay.kappa, lay.alpha, lay.beta = okappa, oalpha, obeta
            layers.append(lay)
        ih, iw, mean_blob = con.execute(
            "SELECT input_height, input_width, mean_activity FROM"
            " convnet_params WHERE convnet = 0").fetchone()
        mean = None
        if mean_blob is not None:
            mean = np.frombuffer(mean_blob, np.float32).reshape(
                ih, iw, layers[0].in_channels).copy()
        for layer_i, wblob, bblob, half in con.execute(
                "SELECT layer, weight, bias, half_precision FROM layer_data"):
            lay = layers[layer_i]
            if wblob is None:
                continue
            dt = np.float16 if half else np.float32
            w = np.frombuffer(wblob, dt).astype(np.float32)
            b = np.frombuffer(bblob, dt).astype(np.float32)
            if lay.type == CONVOLUTIONAL:
                lay.w = w.reshape(lay.count, lay.rows, lay.cols,
                                  lay.channels // lay.partition)
                lay.bias = b
            elif lay.type == FULL_CONNECT:
                lay.w = w.reshape(lay.count, lay.node_count)
                lay.bias = b
        con.close()
        return cls(layers, (ih, iw), mean)

    def write(self, path: str, half_precision: bool = False):
        """ccv_convnet_write twin."""
        con = _sqlite3.connect(path)
        con.executescript(
            "CREATE TABLE IF NOT EXISTS layer_params (layer INTEGER PRIMARY"
            " KEY ASC, type INTEGER, input_matrix_rows INTEGER,"
            " input_matrix_cols INTEGER, input_matrix_channels INTEGER,"
            " input_matrix_partition INTEGER, input_node_count INTEGER,"
            " output_rows INTEGER, output_cols INTEGER, output_channels"
            " INTEGER, output_partition INTEGER, output_count INTEGER,"
            " output_strides INTEGER, output_border INTEGER, output_size"
            " INTEGER, output_kappa REAL, output_alpha REAL, output_beta"
            " REAL, output_relu INTEGER);"
            "CREATE TABLE IF NOT EXISTS convnet_params (convnet INTEGER"
            " PRIMARY KEY ASC, input_height INTEGER, input_width INTEGER,"
            " mean_activity BLOB);"
            "CREATE TABLE IF NOT EXISTS layer_data (layer INTEGER PRIMARY"
            " KEY ASC, weight BLOB, bias BLOB, half_precision INTEGER);")
        for i, lay in enumerate(self.layers):
            if lay.type == CONVOLUTIONAL:
                out = (lay.rows, lay.cols, lay.channels, lay.partition,
                       lay.count, lay.strides, lay.border, 0, 0.0, 0.0, 0.0, 0)
            elif lay.type == FULL_CONNECT:
                out = (0, 0, 0, 1, lay.count, 0, 0, 0, 0.0, 0.0, 0.0, lay.relu)
            elif lay.type in (MAX_POOL, AVERAGE_POOL):
                out = (0, 0, 0, 1, 0, lay.strides, lay.border, lay.size,
                       0.0, 0.0, 0.0, 0)
            else:
                out = (0, 0, 0, 1, 0, 0, 0, lay.size, lay.kappa, lay.alpha,
                       lay.beta, 0)
            con.execute(
                "REPLACE INTO layer_params VALUES"
                " (?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?)",
                (i, lay.type, lay.in_rows, lay.in_cols, lay.in_channels,
                 lay.in_partition, lay.node_count) + out)
            if lay.w is not None:
                dt = np.float16 if half_precision else np.float32
                con.execute(
                    "REPLACE INTO layer_data VALUES (?,?,?,?)",
                    (i, lay.w.astype(dt).tobytes(),
                     lay.bias.astype(dt).tobytes(), int(half_precision)))
        mean = (self.mean_activity.astype(np.float32).tobytes()
                if self.mean_activity is not None else None)
        con.execute("REPLACE INTO convnet_params VALUES (0,?,?,?)",
                    (self.rows, self.cols, mean))
        con.commit()
        con.close()

    # -- forward -----------------------------------------------------------

    def _encode_impl(self, x):
        for lay in self.layers:
            if lay.type == FULL_CONNECT and x.ndim > 2:
                x = x.reshape(x.shape[0], -1)
            x = _layer_forward(lay, x)
        return x

    def encode(self, x) -> jax.Array:
        """ccv_convnet_encode twin on an NHWC float32 batch."""
        return self._encode(jnp.asarray(x, jnp.float32))

    def input_formation(self, img) -> np.ndarray:
        """ccv_convnet_input_formation twin: aspect-preserving resample so
        the short side matches the input size."""
        from ccv_tpu.ops import resample as _resample

        a = np.asarray(img)
        ih, iw = self.input_size
        h, w = a.shape[0], a.shape[1]
        nh = max(ih, int(h * ih / w + 0.5))
        nw = max(iw, int(w * iw / h + 0.5))
        if (h, w) == (nh, nw):
            return a.astype(np.float32)
        interp = _resample.INTER_AREA if (h > ih and w > iw) \
            else _resample.INTER_CUBIC
        return np.asarray(_resample.resample(
            jnp.asarray(a, jnp.float32), rows=nh, cols=nw,
            rows_scale=nh / h, cols_scale=nw / w, interp=interp))

    def classify(self, img, tops: int = 5, symmetric: bool = True):
        """ccv_convnet_classify twin (ccv_convnet.c:723): run the conv stack
        once on the full (center-sliced) image, slice 5 positions at the
        last-conv feature level (x horizontal flip), batch the full-connect
        tail over the 10 patches, average softmax.

        Returns [(class_id, confidence)] top-k."""
        from ccv_tpu.ops import resample as _resample

        a = self.input_formation(img)
        scan = max(i for i, l in enumerate(self.layers)
                   if l.type == CONVOLUTIONAL)
        scale = 1
        for l in self.layers[:scan + 1]:
            if l.type == CONVOLUTIONAL or l.type in (MAX_POOL, AVERAGE_POOL):
                scale *= l.strides
        fc = min(i for i, l in enumerate(self.layers)
                 if l.type == FULL_CONNECT)
        rows = self.rows + ((a.shape[0] - self.rows) // scale) * scale
        cols = self.cols + ((a.shape[1] - self.cols) // scale) * scale
        y0 = (a.shape[0] - rows) // 2
        x0 = (a.shape[1] - cols) // 2
        sl = a[y0:y0 + rows, x0:x0 + cols]
        mean = np.asarray(_resample.resample(
            jnp.asarray(self.mean_activity), rows=rows, cols=cols,
            rows_scale=rows / self.mean_activity.shape[0],
            cols_scale=cols / self.mean_activity.shape[1],
            interp=_resample.INTER_CUBIC)) if self.mean_activity is not None \
            else 0.0
        x = (sl - mean)[None]  # (1, rows, cols, ch)
        feats = []
        for t in range(2 if symmetric else 1):
            h = jnp.flip(jnp.asarray(x), axis=2) if t else jnp.asarray(x)
            for l in self.layers[:scan + 1]:
                h = _layer_forward(l, h)
            fr = self.layers[scan + 1].in_rows
            fc_cols = self.layers[scan + 1].in_cols
            R, C = h.shape[1], h.shape[2]
            offsets = [(0, 0), (C - fc_cols, 0),
                       ((C - fc_cols) // 2, (R - fr) // 2),
                       (0, R - fr), (C - fc_cols, R - fr)]
            for ox, oy in offsets:
                feats.append(h[0, oy:oy + fr, ox:ox + fc_cols])
        z = jnp.stack(feats)
        for l in self.layers[scan + 1:fc]:
            z = _layer_forward(l, z)
        z = z.reshape(z.shape[0], -1)
        for l in self.layers[fc:]:
            z = _layer_forward(l, z)
        probs = np.asarray(jax.nn.softmax(z, axis=-1).sum(axis=0))
        order = np.argsort(-probs, kind="stable")[:tops]
        denom = z.shape[0]
        return [(int(i), float(probs[i] / denom)) for i in order]


# ---------------------------------------------------------------------------
# supervised training (ccv_convnet_supervised_train, ccv_convnet.c:1304)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ConvnetTrainParams:
    """ccv_convnet_train_param_t twin (flattened: one learn-rate set for
    all layers; per-layer arrays accepted too)."""

    max_epoch: int = 10
    mini_batch: int = 64
    learn_rate: float = 0.01
    momentum: float = 0.9
    decay: float = 0.0005
    symmetric: bool = False   # random horizontal flips like the reference


def _trainable(layers):
    return [i for i, l in enumerate(layers)
            if l.type in (CONVOLUTIONAL, FULL_CONNECT)]


def supervised_train(net: "Convnet", images, labels,
                     params: Optional[ConvnetTrainParams] = None,
                     filename: Optional[str] = None,
                     tests: Optional[tuple] = None,
                     rng_seed: int = 0):
    """Train the legacy convnet with SGD+momentum+decay (the reference's
    update rule, ccv_convnet.c _ccv_convnet_update) on (N, H, W, C) uint8
    images + int labels. Saves progress to `filename` (the resumable
    working-file behavior) after every epoch; returns per-epoch
    (loss, test_accuracy) history."""
    import numpy as onp

    params = params or ConvnetTrainParams()
    idxs = _trainable(net.layers)
    weights = [jnp.asarray(net.layers[i].w) for i in idxs]
    biases = [jnp.asarray(net.layers[i].bias) for i in idxs]
    vel = [jnp.zeros_like(w) for w in weights] + \
          [jnp.zeros_like(b) for b in biases]

    layer_list = net.layers

    def forward(ws, bs, x):
        for i, lay in enumerate(layer_list):
            if lay.type in (CONVOLUTIONAL, FULL_CONNECT):
                k = idxs.index(i)
                lay = dataclasses.replace(lay, w=ws[k], bias=bs[k])
            if lay.type == FULL_CONNECT and x.ndim > 2:
                x = x.reshape(x.shape[0], -1)
            x = _layer_forward(lay, x)
        return x

    def loss_fn(ws, bs, x, y):
        logits = forward(ws, bs, x)
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=1).mean()
        return nll

    @jax.jit
    def step(ws, bs, vel, x, y):
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            ws, bs, x, y)
        gw, gb = grads
        flat_p = list(ws) + list(bs)
        flat_g = list(gw) + list(gb)
        new_v = [params.momentum * v - params.decay * params.learn_rate * p
                 - params.learn_rate * g
                 for v, p, g in zip(vel, flat_p, flat_g)]
        new_p = [p + v for p, v in zip(flat_p, new_v)]
        k = len(ws)
        return new_p[:k], new_p[k:], new_v, loss

    rng = onp.random.default_rng(rng_seed)
    x_all = onp.asarray(images, onp.float32)
    if net.mean_activity is not None:
        x_all = x_all - net.mean_activity[None]
    y_all = onp.asarray(labels, onp.int32)
    n = len(x_all)
    history = []
    for epoch in range(params.max_epoch):
        order = rng.permutation(n)
        losses = []
        for b in range(0, n - params.mini_batch + 1, params.mini_batch):
            sel = order[b:b + params.mini_batch]
            xb = x_all[sel]
            if params.symmetric:
                flip = rng.random(len(sel)) < 0.5
                xb = xb.copy()
                xb[flip] = xb[flip, :, ::-1]
            weights, biases, vel, loss = step(
                weights, biases, vel, jnp.asarray(xb),
                jnp.asarray(y_all[sel]))
            losses.append(float(loss))
        acc = None
        if tests is not None:
            tx, ty = tests
            txf = onp.asarray(tx, onp.float32)
            if net.mean_activity is not None:
                txf = txf - net.mean_activity[None]
            logits = forward(weights, biases, jnp.asarray(txf))
            acc = float((onp.asarray(jnp.argmax(logits, -1))
                         == onp.asarray(ty)).mean())
        history.append((float(onp.mean(losses)), acc))
        # write back + persist (the reference saves net+momentum each epoch)
        for k, i in enumerate(idxs):
            net.layers[i].w = onp.asarray(weights[k])
            net.layers[i].bias = onp.asarray(biases[k])
        if filename:
            net.write(filename)
    return history
