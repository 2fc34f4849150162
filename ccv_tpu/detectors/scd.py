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

# small standalone program for the octave chain (shared across levels and
# images; jax.jit caches by input shape)
_sample_down_jit = jax.jit(lambda a: resample.sample_down(a))


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

def _phase_tables(cascade: ScdClassifierCascade, feats: np.ndarray):
    """Corner tables for a subset of features: (M (F*4 boxes x nd), offset
    pairs (nd, 2), per-feature weights/bias, per-stage onehot/thresholds)."""
    sy, dy = cascade.sy[feats], cascade.dy[feats]
    sx, dx = cascade.sx[feats], cascade.dx[feats]
    # corner order per box: (sy,sx), (sy,dx), (dy,sx), (dy,dx) with signs
    # +1, -1, -1, +1 (box sum off the SAT)
    ys = np.stack([sy, sy, dy, dy], axis=-1)  # (F, 4 boxes, 4 corners)
    xs = np.stack([sx, dx, sx, dx], axis=-1)
    signs = np.array([1.0, -1.0, -1.0, 1.0], np.float32)
    F = len(feats)
    pairs = np.stack([ys, xs], axis=-1).reshape(-1, 2)  # (F*4*4, 2)
    uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
    M = np.zeros((F * 4, len(uniq)), np.float32)
    rows = np.repeat(np.arange(F * 4), 4)
    np.add.at(M, (rows, inv), np.tile(signs, F * 4))
    stages = np.unique(cascade.stage_of[feats])
    onehot = np.zeros((F, len(stages)), np.float32)
    for si, s in enumerate(stages):
        onehot[cascade.stage_of[feats] == s, si] = 1.0
    return dict(
        M=jnp.asarray(M), offsets=uniq.astype(np.int32),
        w=jnp.asarray(cascade.w[feats]), bias=jnp.asarray(cascade.bias[feats]),
        onehot=jnp.asarray(onehot),
        thresholds=jnp.asarray(cascade.thresholds[stages]))


_EARLY_FEATS = 16  # stages up to this cumulative feature count gate phase A


def _surf_responses(flat_sat, base_idx, phase):
    """SAT corner gather -> box sums -> L2Hys -> per-stage sums.

    ONE gather (windows x distinct-offsets, 8-channel rows) replaces the
    round-1 per-offset strided-slice stack (1,010 slice kernels/level); the
    +-1 corner combination is one MXU matmul.
    base_idx: (n,) flattened window-origin indices into the (H+1)*(W+1) SAT.
    Returns (v (n, n_stages_in_phase), passed (n,)).
    """
    offs, M, w, bias = phase["off_flat"], phase["M"], phase["w"], phase["bias"]
    D = flat_sat[base_idx[:, None] + offs[None, :]]      # (n, nd, 8)
    box = jnp.einsum("fd,ndc->nfc", M, D,
                     preferred_element_type=jnp.float32)  # (n, F*4, 8)
    n = box.shape[0]
    F = w.shape[0]
    surf = box.reshape(n, F, 32)
    # L2Hys: normalize, clamp, renormalize (ccv_scd.c:502-533)
    inv = 1.0 / (jnp.sqrt(jnp.sum(surf * surf, axis=-1, keepdims=True)) + 1e-6)
    surf = jnp.clip(surf * inv, -_THETA, _THETA)
    inv2 = 1.0 / (jnp.sqrt(jnp.sum(surf * surf, axis=-1, keepdims=True)) + 1e-6)
    surf = surf * inv2
    logit = jnp.einsum("nfk,fk->nf", surf, w) + bias
    resp = jnp.tanh(0.5 * logit)  # (exp(x)-1)/(exp(x)+1)
    v = resp @ phase["onehot"]
    passed = jnp.all(v > phase["thresholds"], axis=-1)
    return v, passed


def _eval_level(sat8, phase_a, phase_b, last_count, n_stages: int,
                ny: int, nx: int, step: int, K: int):
    """Evaluate one pyramid level as a two-phase staged cascade.

    The reference's per-window early exit (ccv_scd.c:1719-1768) becomes:
    phase A evaluates the first few stages for EVERY window (dense, tiny);
    the survivors are compacted to a fixed-capacity index buffer
    (jnp.nonzero(size=K)) and phase B evaluates the remaining ~95% of the
    features only on those — the dense-tensor answer to data-dependent
    control flow, with ~20x fewer FLOPs than all-features-everywhere.

    Returns (idx (K,), passed (K,), conf (K,), n_survivors_A ()).
    """
    W1 = sat8.shape[1]
    flat = sat8.reshape(-1, 8)
    wy = jnp.arange(ny, dtype=jnp.int32) * step
    wx = jnp.arange(nx, dtype=jnp.int32) * step
    base = (wy[:, None] * W1 + wx[None, :]).reshape(-1)  # (nwin,)
    v_a, pass_a = _surf_responses(flat, base, phase_a)
    if phase_b is None:
        # tiny cascade: single phase, "compaction" is just the pass mask
        conf = v_a[:, -1] / last_count + (n_stages - 1)
        idx = jnp.arange(base.shape[0], dtype=jnp.int32)
        return idx, pass_a, conf, jnp.sum(pass_a)
    idx = jnp.nonzero(pass_a, size=K, fill_value=0)[0].astype(jnp.int32)
    count = jnp.sum(pass_a)
    v_b, pass_b = _surf_responses(flat, base[idx], phase_b)
    # mask padding slots (fill_value=0 would duplicate window 0 if it passed)
    valid = jnp.arange(K) < jnp.minimum(count, K)
    passed = pass_b & pass_a[idx] & valid
    conf = v_b[:, -1] / last_count + (n_stages - 1)
    return idx, passed, conf, count


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


# Per-LEVEL jitted programs, keyed by (level geometry, cascade geometry).
#
# Round 1 traced the entire pyramid + every level's cascade into ONE XLA
# program; on street.png that emitted a 17.5 MB MLIR module which the TPU
# compile helper killed. Splitting per level keeps every module small (and
# identical level shapes share the compiled program across octave chains);
# XLA's async dispatch still pipelines the per-level launches back to back.
_LEVEL_CACHE: dict = {}


def _cascade_tables(cascade: ScdClassifierCascade):
    """Per-phase cascade tables (device-resident), computed once per
    cascade object and cached on it (fixes the round-1 bug of re-deriving
    the feature tables on every detect() call).

    Phase A = the leading stages totalling <= _EARLY_FEATS features (the
    cheap rejector); phase B = everything else."""
    tabs = getattr(cascade, "_tables", None)
    if tabs is None:
        counts = cascade.stage_counts
        split = 0
        cum = 0
        while split < len(counts) and cum + counts[split] <= _EARLY_FEATS:
            cum += counts[split]
            split += 1
        split = max(1, split)
        feats_a = np.nonzero(cascade.stage_of < split)[0]
        feats_b = np.nonzero(cascade.stage_of >= split)[0]
        tabs = dict(
            phase_a=_phase_tables(cascade, feats_a),
            phase_b=_phase_tables(cascade, feats_b) if len(feats_b) else None,
            last_count=float(cascade.stage_counts[-1]))
        object.__setattr__(cascade, "_tables", tabs)
    return tabs


def _level_capacity(nwin: int) -> int:
    """Fixed phase-B buffer size: generous vs the expected <5% survivor
    rate; detect() falls back to K=nwin on (rare) overflow."""
    return int(min(nwin, max(512, nwin // 4)))


def _get_level_fn(src_shape, rows: int, cols: int, ny: int, nx: int,
                  is_base: bool, cascade: ScdClassifierCascade,
                  step: int, tabs, K: int):
    """One jitted program for one pyramid level: (optional INTER_AREA
    resample) -> margin pad -> scd_map -> SAT -> staged cascade eval."""
    # id(cascade) matters: the phase tables (weights/thresholds) are traced
    # into the program as constants, so same-geometry cascades with
    # different weights must NOT share compiled programs
    key = (id(cascade), src_shape, rows, cols, ny, nx, is_base, step, K)
    fn = _LEVEL_CACHE.get(key)
    if fn is not None:
        return fn
    margin = cascade.margin
    n_stages = cascade.n_stages
    # flattened per-level corner offsets (depend on the padded SAT width)
    W1 = cols + margin[0] + margin[2] + 1

    def with_flat(phase):
        if phase is None:
            return None
        p = dict(phase)
        offs = phase["offsets"]
        p["off_flat"] = jnp.asarray(offs[:, 0] * W1 + offs[:, 1], jnp.int32)
        return p

    phase_a = with_flat(tabs["phase_a"])
    phase_b = with_flat(tabs["phase_b"])

    def level(src, last_count):
        image = src if is_base else resample.resample(
            src, rows=rows, cols=cols, rows_scale=rows / src.shape[0],
            cols_scale=cols / src.shape[1], interp=resample.INTER_AREA)
        if any(margin):
            pads = [(margin[1], margin[3]), (margin[0], margin[2]), (0, 0)]
            image = jnp.pad(image, pads)
        smap = scd_map(image)
        sat = algebra.sat(smap, padding=algebra.PADDING_ZERO)
        sat8 = sat[..., :8].astype(jnp.float32)
        return _eval_level(sat8, phase_a, phase_b, last_count, n_stages,
                           ny=ny, nx=nx, step=step, K=K)

    fn = jax.jit(level)
    _LEVEL_CACHE[key] = fn
    return fn


def detect(img, cascade: ScdClassifierCascade,
           params: Optional[ScdParams] = None) -> List[Comp]:
    """ccv_scd_detect_objects twin (ccv_scd.c:1653) for a single cascade.

    The octave chain (sample_down) and each pyramid level (INTER_AREA
    resample -> SURF map -> SAT -> every window's cascade evaluation) run
    as small per-level jitted XLA programs, dispatched asynchronously; the
    surviving-window masks come back to the host at the end.
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
    specs, scale_upto = _level_specs(H, W, cascade, params)
    step = params.step_through
    tabs = _cascade_tables(cascade)
    pyr = [jnp.asarray(a)]
    for _ in range(1, scale_upto):
        pyr.append(_sample_down_jit(pyr[-1]))
    outs = []
    for (octave, k, rows, cols, ny, nx, scale) in specs:
        src = pyr[octave]
        fn = _get_level_fn(tuple(src.shape), rows, cols, ny, nx, k == 0,
                           cascade, step, tabs, K=_level_capacity(ny * nx))
        outs.append(fn(src, tabs["last_count"]))
    outs = jax.device_get(outs)
    comps: List[Comp] = []
    for spec, (idx, passed, conf, count) in zip(specs, outs):
        (octave, k, rows, cols, ny, nx, scale) = spec
        K = _level_capacity(ny * nx)
        if int(count) > K:
            # phase-A survivor overflow (rare): rerun with full capacity
            src = pyr[octave]
            fn = _get_level_fn(tuple(src.shape), rows, cols, ny, nx, k == 0,
                               cascade, step, tabs, K=ny * nx)
            idx, passed, conf, count = jax.device_get(
                fn(src, tabs["last_count"]))
        passed = np.asarray(passed)
        if not passed.any():
            continue
        idx = np.asarray(idx)
        conf = np.asarray(conf)
        sc = (scale / up_ratio) * (1 << octave)
        for j in np.nonzero(passed)[0]:
            wy, wx = divmod(int(idx[j]), nx)
            comps.append(Comp(
                x=int((wx * step + 0.5) * sc - 0.5),
                y=int((wy * step + 0.5) * sc - 0.5),
                width=int(eff_w * sc),
                height=int(eff_h * sc),
                confidence=float(conf[j]),
                classification_id=1))
    return merge_detections(comps, params.min_neighbors)
