"""SCD (SURF-cascade) face detector (reference: lib/ccv_scd.c).

TPU-native redesign of the scalar sliding-window loop (ccv_scd.c:1719-1768):

- the 11-channel SURF-ish feature map (``scd_map``) is a handful of fused
  XLA ops (blur + four 3-tap sobels + strongest-channel select + LUV);
- the summed-area table turns every box sum into 4 reads;
- ALL sliding windows at one pyramid level are evaluated at once: one gather
  pulls every (window x feature x corner) SAT row, box sums / L2Hys
  normalization / stump dot-products run as dense batched tensor math on the
  MXU, and the cascade's early-exit becomes a mask reduction (every stage is
  evaluated for every window — far more FLOPs than the CPU early-exit, but
  they're free on TPU and there's no divergence);
- variable-length outputs (the surviving rects) cross to the host as a
  boolean mask + confidence plane; grouping/NMS happens at the host edge.

Cascade files are the reference's SQLite format (ccv_scd.c:1547), read with
Python's sqlite3.
"""

from __future__ import annotations

import dataclasses
import math
import sqlite3
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.core import algebra
from ccv_tpu.detectors.common import Comp, merge_detections
from ccv_tpu.ops import basic, resample

SCD_CHANNELS = 11  # 4 signed + 4 abs gradients + LUV (or gray + 2 zeros)
_THETA = 2.0 / math.sqrt(32.0)  # L2Hys clamp


@dataclasses.dataclass
class ScdClassifierCascade:
    """Loaded cascade: feature tables flattened across stages."""

    width: int
    height: int
    margin: tuple  # (left, top, right, bottom)
    stage_counts: np.ndarray      # (n_stages,)
    thresholds: np.ndarray        # (n_stages,)
    sx: np.ndarray                # (n_features, 4)
    sy: np.ndarray
    dx: np.ndarray
    dy: np.ndarray
    bias: np.ndarray              # (n_features,)
    w: np.ndarray                 # (n_features, 32)
    stage_of: np.ndarray          # (n_features,) stage index per feature

    @property
    def n_stages(self):
        return len(self.stage_counts)

    @property
    def n_features(self):
        return len(self.bias)


@dataclasses.dataclass
class ScdParams:
    """ccv_scd_default_params twin (ccv_scd.c:20)."""

    interval: int = 5
    min_neighbors: int = 1
    step_through: int = 4
    size: tuple = (48, 48)  # (width, height)


def load_cascade(path: str) -> ScdClassifierCascade:
    con = sqlite3.connect(path)
    count, ml, mt, mr, mb, w_, h_ = con.execute(
        "SELECT count, margin_left, margin_top, margin_right, margin_bottom,"
        " size_width, size_height FROM cascade_params WHERE id = 0").fetchone()
    stage_counts, thresholds = [], []
    for _, cnt, th in con.execute(
            "SELECT classifier, count, threshold FROM classifier_params ORDER BY classifier"):
        stage_counts.append(cnt)
        thresholds.append(th)
    sx, sy, dx, dy, bias, w, stage_of = [], [], [], [], [], [], []
    rows = con.execute(
        "SELECT classifier, id, sx_0, sy_0, dx_0, dy_0, sx_1, sy_1, dx_1, dy_1,"
        " sx_2, sy_2, dx_2, dy_2, sx_3, sy_3, dx_3, dy_3, bias, w"
        " FROM feature_params ORDER BY classifier, id").fetchall()
    for r in rows:
        stage_of.append(r[0])
        sx.append([r[2], r[6], r[10], r[14]])
        sy.append([r[3], r[7], r[11], r[15]])
        dx.append([r[4], r[8], r[12], r[16]])
        dy.append([r[5], r[9], r[13], r[17]])
        bias.append(r[18])
        w.append(np.frombuffer(r[19], dtype=np.float32, count=32))
    con.close()
    return ScdClassifierCascade(
        width=w_, height=h_, margin=(ml, mt, mr, mb),
        stage_counts=np.array(stage_counts, np.int32),
        thresholds=np.array(thresholds, np.float32),
        sx=np.array(sx, np.int32), sy=np.array(sy, np.int32),
        dx=np.array(dx, np.int32), dy=np.array(dy, np.int32),
        bias=np.array(bias, np.float32), w=np.stack(w).astype(np.float32),
        stage_of=np.array(stage_of, np.int32))


# ---------------------------------------------------------------------------
# feature map
# ---------------------------------------------------------------------------

def _luv(rgb01):
    """RGB [0,1] -> scaled LUV, replicating _ccv_rgb_to_luv (ccv_scd.c:298)
    including its 2048-entry cube-root LUT quantization."""
    r, g, b = rgb01[..., 0], rgb01[..., 1], rgb01[..., 2]
    x = 0.412453 * r + 0.35758 * g + 0.180423 * b
    y = 0.212671 * r + 0.71516 * g + 0.072169 * b
    z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    x_n, y_n = 0.312713, 0.329016
    uv_n_div = -2.0 * x_n + 12.0 * y_n + 3.0
    u_n = 4.0 * x_n / uv_n_div
    v_n = 9.0 * y_n / uv_n_div
    uv_div = jnp.maximum(x + 15.0 * y + 3.0 * z, 1.1920929e-07)
    u = 4.0 * x / uv_div
    v = 9.0 * y / uv_div
    # LUT: cube_root[i] = cbrt(i / 2047), i = (int)(y * 2047)
    yi = jnp.clip(jnp.floor(y * 2047.0), 0, 2047)
    y_cbrt = jnp.cbrt(yi / 2047.0)
    l = jnp.maximum(0.0, 116.0 * y_cbrt - 16.0)
    uu = 13.0 * l * (u - u_n)
    vv = 13.0 * l * (v - v_n)
    return (l * (255.0 / 100.0),
            (uu + 134.0) * (255.0 / (220.0 + 134.0)),
            (vv + 140.0) * (255.0 / (122.0 + 140.0)))


def scd_map(img: jax.Array) -> jax.Array:
    """ccv_scd twin (ccv_scd.c:325): 11-channel float32 feature map.

    blur(0.5) -> 4 directional 3-tap sobels -> per-pixel strongest-channel
    selection (color) -> [dx,dy,du,dv, |dx|,|dy|,|du|,|dv|, L,U,V].
    """
    blurred = basic.blur(img, sigma=0.5)
    grads = [basic.sobel(blurred, 1, 0), basic.sobel(blurred, 0, 1),
             basic.sobel(blurred, 1, 1), basic.sobel(blurred, -1, 1)]
    color = img.ndim == 3 and img.shape[-1] == 3
    chans = []
    for gim in grads:
        gf = gim.astype(jnp.float32)
        if color:
            # strongest channel by |value|; argmax keeps the first on ties,
            # matching the reference's strict-greater update
            best = jnp.argmax(jnp.abs(gf), axis=-1)
            gf = jnp.take_along_axis(gf, best[..., None], axis=-1)[..., 0]
        elif gf.ndim == 3:
            gf = gf[..., 0]
        chans.append(gf)
    out = chans + [jnp.abs(c) for c in chans]
    if color:
        l, u, v = _luv(img.astype(jnp.float32) / 255.0)
        out += [l, u, v]
    else:
        gray = (img[..., 0] if img.ndim == 3 else img).astype(jnp.float32) / 255.0
        out += [gray, jnp.zeros_like(gray), jnp.zeros_like(gray)]
    return jnp.stack(out, axis=-1)


# ---------------------------------------------------------------------------
# batched window evaluation
# ---------------------------------------------------------------------------

def _eval_level(sat8, M, offsets, w, bias, stage_onehot, thresholds,
                last_count, ny: int, nx: int, step: int):
    """Evaluate every window on one pyramid level — gather-free.

    The windows form a stride-`step` grid, so each distinct feature-corner
    offset (oy, ox) corresponds to ONE strided slice of the SAT; the
    4-corner box sums of all features then become a single dense matmul
    ``M @ D`` on the MXU (M: (F*4, nd) +-1 corner matrix; D: (nd, nwin*8)
    stacked slices). This replaces the element gather that dominated the
    first implementation.

    sat8: (H+1, W+1, 8) zero-padded SAT of the first 8 scd channels.
    Returns (pass_mask, confidence) of shape (ny*nx,).
    """
    F = w.shape[0]
    nwin = ny * nx
    slices = [
        jax.lax.slice(sat8, (int(oy), int(ox), 0),
                      (int(oy) + (ny - 1) * step + 1,
                       int(ox) + (nx - 1) * step + 1, 8),
                      (step, step, 1))
        for oy, ox in offsets
    ]
    D = jnp.stack(slices).reshape(len(offsets), nwin * 8)
    box = jnp.matmul(M, D, preferred_element_type=jnp.float32)  # (F*4, nwin*8)
    surf = box.reshape(F, 4, nwin, 8).transpose(2, 0, 1, 3).reshape(nwin, F, 32)
    # L2Hys: normalize, clamp, renormalize (ccv_scd.c:502-533)
    inv = jax.lax.rsqrt(jnp.sum(surf * surf, axis=-1, keepdims=True)) \
        if False else 1.0 / (jnp.sqrt(jnp.sum(surf * surf, axis=-1, keepdims=True)) + 1e-6)
    surf = jnp.clip(surf * inv, -_THETA, _THETA)
    inv2 = 1.0 / (jnp.sqrt(jnp.sum(surf * surf, axis=-1, keepdims=True)) + 1e-6)
    surf = surf * inv2
    logit = jnp.einsum("wfk,fk->wf", surf, w) + bias  # (nwin, F)
    resp = jnp.tanh(0.5 * logit)  # (exp(x)-1)/(exp(x)+1)
    v = resp @ stage_onehot  # (nwin, n_stages)
    passed = jnp.all(v > thresholds, axis=-1)
    conf = v[:, -1] / last_count + (thresholds.shape[0] - 1)
    return passed, conf


def _prepare_feature_tables(cascade: ScdClassifierCascade):
    """Host-side static tables: distinct corner offsets + the +-1 corner
    matrix M (F*4 boxes x nd distinct offsets), and the stage one-hot."""
    # corner order per box: (sy,sx), (sy,dx), (dy,sx), (dy,dx) with signs
    # +1, -1, -1, +1 (box sum off the SAT)
    ys = np.stack([cascade.sy, cascade.sy, cascade.dy, cascade.dy], axis=-1)  # (F,4,4)
    xs = np.stack([cascade.sx, cascade.dx, cascade.sx, cascade.dx], axis=-1)
    signs = np.array([1.0, -1.0, -1.0, 1.0], np.float32)
    F = cascade.n_features
    pairs = np.stack([ys, xs], axis=-1).reshape(-1, 2)  # (F*4*4, 2)
    uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
    nd = len(uniq)
    M = np.zeros((F * 4, nd), np.float32)
    rows = np.repeat(np.arange(F * 4), 4)
    np.add.at(M, (rows, inv), np.tile(signs, F * 4))
    offsets = [(int(oy), int(ox)) for oy, ox in uniq]
    n_stages = cascade.n_stages
    onehot = np.zeros((F, n_stages), np.float32)
    onehot[np.arange(F), cascade.stage_of] = 1.0
    return M, tuple(offsets), onehot


def _level_specs(H: int, W: int, cascade: ScdClassifierCascade,
                 params: ScdParams):
    """Host-side plan: one (octave, k, rows, cols, ny, nx, scale) per level."""
    eff_h = cascade.height - cascade.margin[1] - cascade.margin[3]
    eff_w = cascade.width - cascade.margin[0] - cascade.margin[2]
    scale_upto = max(1, int(math.log2(min(H / eff_h, W / eff_w))) + 1)
    scale_ratio = 2.0 ** (1.0 / (params.interval + 1))
    specs = []
    oh, ow = H, W
    for octave in range(scale_upto):
        scale = 1.0
        for k in range(params.interval + 1):
            rows = int(oh / scale + 0.5)
            cols = int(ow / scale + 0.5)
            if rows >= cascade.height and cols >= cascade.width:
                mrows = rows + cascade.margin[1] + cascade.margin[3]
                mcols = cols + cascade.margin[0] + cascade.margin[2]
                step = params.step_through
                ny = max(0, -(-(mrows - cascade.height) // step))
                nx = max(0, -(-(mcols - cascade.width) // step))
                if ny and nx:
                    specs.append((octave, k, rows, cols, ny, nx, scale))
            scale *= scale_ratio
        oh, ow = oh // 2, ow // 2
    return tuple(specs), scale_upto


# cache of traced whole-pyramid programs keyed by (shape, cascade geometry)
_PROGRAM_CACHE: dict = {}


def _get_program(H: int, W: int, cascade: ScdClassifierCascade,
                 params: ScdParams):
    key = (H, W, cascade.width, cascade.height, cascade.margin,
           cascade.n_features, params.interval, params.step_through)
    if key in _PROGRAM_CACHE:
        return _PROGRAM_CACHE[key]
    specs, scale_upto = _level_specs(H, W, cascade, params)
    step = params.step_through
    M_np, offsets, _ = _prepare_feature_tables(cascade)

    def program(a, w, bias, onehot, thresholds, last_count):
        """The WHOLE pyramid + detect as one XLA program: one dispatch."""
        M = jnp.asarray(M_np)
        pyr = [a]
        for _ in range(1, scale_upto):
            pyr.append(resample.sample_down(pyr[-1]))
        outs = []
        for (octave, k, rows, cols, ny, nx, scale) in specs:
            level = pyr[octave]
            image = level if k == 0 else resample.resample(
                level, rows=rows, cols=cols, rows_scale=rows / level.shape[0],
                cols_scale=cols / level.shape[1], interp=resample.INTER_AREA)
            if any(cascade.margin):
                pads = [(cascade.margin[1], cascade.margin[3]),
                        (cascade.margin[0], cascade.margin[2]), (0, 0)]
                image = jnp.pad(image, pads)
            smap = scd_map(image)
            sat = algebra.sat(smap, padding=algebra.PADDING_ZERO)
            sat8 = sat[..., :8].astype(jnp.float32)
            passed, conf = _eval_level(
                sat8, M, offsets, w, bias, onehot,
                thresholds, last_count, ny=ny, nx=nx, step=step)
            outs.append((passed, conf))
        return outs

    jitted = jax.jit(program, static_argnames=())
    _PROGRAM_CACHE[key] = (jitted, specs)
    return jitted, specs


def detect(img, cascade: ScdClassifierCascade,
           params: Optional[ScdParams] = None) -> List[Comp]:
    """ccv_scd_detect_objects twin (ccv_scd.c:1653) for a single cascade.

    The full pyramid (octave chain of sample_down; interval+1 INTER_AREA
    levels per octave) and every window's cascade evaluation run as ONE
    jitted XLA program — a single device dispatch per image.
    """
    from ccv_tpu.core.dense_matrix import DenseMatrix, as_array

    params = params or ScdParams()
    a = as_array(img)
    if a.ndim == 2:
        a = a[..., None]
    H, W = a.shape[0], a.shape[1]
    size_w, size_h = params.size
    up_ratio = max(1.0, cascade.width / size_w, cascade.height / size_h)
    if up_ratio - 1.0 > 1e-4:
        H2, W2 = int(H * up_ratio + 0.5), int(W * up_ratio + 0.5)
        a = resample.resample(a, rows=H2, cols=W2, rows_scale=up_ratio,
                              cols_scale=up_ratio, interp=resample.INTER_CUBIC)
        H, W = H2, W2
    eff_h = cascade.height - cascade.margin[1] - cascade.margin[3]
    eff_w = cascade.width - cascade.margin[0] - cascade.margin[2]
    program, specs = _get_program(H, W, cascade, params)
    outs = program(a, jnp.asarray(cascade.w), jnp.asarray(cascade.bias),
                   jnp.asarray(_prepare_feature_tables(cascade)[2]),
                   jnp.asarray(cascade.thresholds),
                   float(cascade.stage_counts[-1]))
    outs = jax.device_get(outs)
    comps: List[Comp] = []
    step = params.step_through
    for (octave, k, rows, cols, ny, nx, scale), (passed, conf) in zip(specs, outs):
        passed = np.asarray(passed)
        if not passed.any():
            continue
        conf = np.asarray(conf)
        sc = (scale / up_ratio) * (1 << octave)
        for widx in np.nonzero(passed)[0]:
            wy, wx = divmod(int(widx), nx)
            comps.append(Comp(
                x=int((wx * step + 0.5) * sc - 0.5),
                y=int((wy * step + 0.5) * sc - 0.5),
                width=int(eff_w * sc),
                height=int(eff_h * sc),
                confidence=float(conf[widx]),
                classification_id=1))
    return merge_detections(comps, params.min_neighbors)
