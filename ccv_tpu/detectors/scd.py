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

# On TPU the default matmul feeds bf16 into the MXU; raw SAT values are
# ~1e6 while box sums are ~1e2-1e4, so the mantissa loss adds noise to the
# box sums, and bf16-rounded phase-B matmuls were measured (round 3, the
# reference's own demo photo) to kill 17 of the 26 true surviving windows
# — a real fidelity break on the chip. The exact path therefore does BOTH:
# center the matmul operands on their first corner per window
# (mathematically a no-op — every corner row of M sums to zero — but it
# shrinks the operand magnitude from SAT scale ~1e6 to box scale ~1e2)
# AND run the matmul at Precision.HIGHEST (6-pass bf16 ~ f32 accuracy).
# With both, the TPU survivor set matches the CPU/f32 oracle window for
# window (26/26 comps, identical boxes) on the demo photo. Exact is the
# DEFAULT on TPU; set CCV_TPU_SCD_EXACT=0 only to measure the noise cost.
import os as _os

TPU_EXACT_BOX_SUMS = _os.environ.get("CCV_TPU_SCD_EXACT", "1") != "0"

# Exact box-sum FORM on TPU: "take" = 4 f32 corner-row gathers + 3 VPU adds
# (round 4); "matmul" = first-corner-centered matmul at Precision.HIGHEST
# (round 3). Both are window-exact; which is faster depends on the phase
# width (the round-4 swap to "take" regressed the big SCD octaves 42 -> 123
# ms measured, while helping ICF) — so the production choice is autotuned
# per octave (see _octave_variants); this env var only pins it for A/B
# experiments.
BOX_SUM_FORM = _os.environ.get("CCV_TPU_SCD_BOX_FORM", "")

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


def scd_map_cf8(img: jax.Array) -> jax.Array:
    """Channels-FIRST (8, H, W) gradient map — the first 8 scd_map
    channels (the only ones the cascade features read: ccv_scd.c:445 maps
    feature channels onto dx/dy/du/dv and their absolutes). Per-channel
    values are computed by the same blur/sobel/select calls as scd_map;
    only the final stack axis differs, so the (H, W, 11)-minor relayout
    the SAT/plane pipeline used to pay (~2.4 ms/level on the demo photo)
    never exists."""
    blurred = basic.blur(img, sigma=0.5)
    grads = [basic.sobel(blurred, 1, 0), basic.sobel(blurred, 0, 1),
             basic.sobel(blurred, 1, 1), basic.sobel(blurred, -1, 1)]
    color = img.ndim == 3 and img.shape[-1] == 3
    chans = []
    for gim in grads:
        gf = gim.astype(jnp.float32)
        if color:
            g0, g1, g2 = gf[..., 0], gf[..., 1], gf[..., 2]
            a0, a1, a2 = jnp.abs(g0), jnp.abs(g1), jnp.abs(g2)
            v = jnp.where(a1 > a0, g1, g0)
            a01 = jnp.maximum(a0, a1)
            gf = jnp.where(a2 > a01, g2, v)
        elif gf.ndim == 3:
            gf = gf[..., 0]
        chans.append(gf)
    return jnp.stack(chans + [jnp.abs(c) for c in chans], axis=0)


def _sat_cf8(x: jax.Array) -> jax.Array:
    """Zero-padded SAT of a channels-first (8, H, W) map as two batched
    triangular MXU contractions (algebra.sat_mxu's math with channels as
    the batch dim, so the result stays channels-first): (8, H+1, W+1)."""
    H, W = x.shape[1], x.shape[2]

    def tri(n):
        return (jnp.arange(n + 1)[:, None] - 1
                >= jnp.arange(n)[None, :]).astype(x.dtype)

    s1 = jnp.einsum("vw,chw->chv", tri(W), x,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("uh,chv->cuv", tri(H), s1,
                      precision=jax.lax.Precision.HIGHEST)


def _planes_cf(sat_cf: jax.Array, hs_pad: int, ws_pad: int, step: int):
    """(8, H1, W1) SAT -> (step*step, 8, hs_pad, ws_pad) phase planes with
    window-col as the lane dim: planes[py*step+px, c, h, w] =
    sat[c, h*step+py, w*step+px] (same convention as _phase_planes)."""
    C = sat_cf.shape[0]
    Hp, Wp = hs_pad * step, ws_pad * step
    s = jnp.pad(sat_cf, ((0, 0), (0, max(0, Hp - sat_cf.shape[1])),
                         (0, max(0, Wp - sat_cf.shape[2]))))[:, :Hp, :Wp]
    s = s.reshape(C, hs_pad, step, ws_pad, step)
    return s.transpose(2, 4, 0, 1, 3).reshape(step * step, C, hs_pad,
                                              ws_pad)


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
            # strongest channel by |value|: strict-greater updates keep the
            # first channel on ties (matching the reference), expressed as
            # elementwise selects (a per-pixel argmax+gather is ~10x slower
            # on the VPU)
            g0, g1, g2 = gf[..., 0], gf[..., 1], gf[..., 2]
            a0, a1, a2 = jnp.abs(g0), jnp.abs(g1), jnp.abs(g2)
            v = jnp.where(a1 > a0, g1, g0)
            a01 = jnp.maximum(a0, a1)
            gf = jnp.where(a2 > a01, g2, v)
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
        # per-box corner rows of Dt: box = Dt[c0] - Dt[c1] - Dt[c2] + Dt[c3]
        # (the TPU exact path gathers rows in f32 instead of a matmul)
        cidx=jnp.asarray(inv.reshape(F * 4, 4).astype(np.int32)),
        w=jnp.asarray(cascade.w[feats]), bias=jnp.asarray(cascade.bias[feats]),
        onehot=jnp.asarray(onehot),
        thresholds=jnp.asarray(cascade.thresholds[stages]))


_EARLY_FEATS = 16  # stages up to this cumulative feature count gate phase A
_MID_FEATS = 64    # next stage block (phase B1) feature budget


def _phase_planes(sat8, ny: int, nx: int, max_oy: int, max_ox: int,
                  step: int):
    """Decompose the SAT into step^2 phase planes: plane (py, px) holds
    sat8[py::step, px::step]. Every stride-`step` corner access then
    becomes a UNIT-STRIDE slice of one plane — strided loads and 8-float
    row gathers run at a small fraction of HBM bandwidth on TPU, dense
    slices at full rate. One (Hp, Wp, 8) transpose per level buys it.

    Returns (planes (step, step, Hp/step, Wp/step, 8), th, tw) where
    (th, tw) bound the per-window tile for compacted reads."""
    th = max_oy // step + 1
    tw = max_ox // step + 1
    Hp = (ny + th) * step
    Wp = (nx + tw) * step
    pad_h = Hp - sat8.shape[0]
    pad_w = Wp - sat8.shape[1]
    s = jnp.pad(sat8, ((0, max(0, pad_h)), (0, max(0, pad_w)), (0, 0)))
    s = s[:Hp, :Wp]
    planes = s.reshape(Hp // step, step, Wp // step, step, 8)
    planes = planes.transpose(1, 3, 0, 2, 4)
    return planes, th, tw


def _grid_corner_slices(planes, offsets, ny: int, nx: int, step: int):
    """D for EVERY window on the stride-`step` grid: one unit-stride slice
    of the matching phase plane per distinct corner offset, stacked to
    (nwin, nd, 8)."""
    slices = [
        jax.lax.slice(
            planes,
            (int(oy) % step, int(ox) % step, int(oy) // step,
             int(ox) // step, 0),
            (int(oy) % step + 1, int(ox) % step + 1,
             int(oy) // step + ny, int(ox) // step + nx, 8))[0, 0]
        for oy, ox in offsets
    ]
    return jnp.stack(slices, axis=2).reshape(ny * nx, len(offsets), 8)


def _grid_corner_slices_T(planes, offsets, ny: int, nx: int, step: int):
    """Dt for EVERY window, built DIRECTLY in the (nd, nwin*8) matmul
    operand layout. Each corner's (ny, nx, 8) plane slice is contiguous,
    so stacking per-corner rows needs no relayout — at phase-B1 widths
    (354 corners x 14k windows) the (nwin, nd, 8) form plus its transpose
    materializes ~2x150 MB and costs more than the matmul it feeds."""
    rows = [
        jax.lax.slice(
            planes,
            (int(oy) % step, int(ox) % step, int(oy) // step,
             int(ox) // step, 0),
            (int(oy) % step + 1, int(ox) % step + 1,
             int(oy) // step + ny, int(ox) // step + nx, 8))[0, 0]
        .reshape(ny * nx * 8)
        for oy, ox in offsets
    ]
    return jnp.stack(rows, axis=0)


def _tile_selector(offsets, th: int, tw: int, step: int, M: np.ndarray):
    """Remap the corner matrix M (F*4, nd) onto per-window TILE positions:
    column j of the result corresponds to flattened tile index
    (oy%step, ox%step, oy//step, ox//step) so box sums become ONE matmul
    against the contiguous tile extract (no second gather)."""
    F4, nd = M.shape
    M2 = np.zeros((F4, step * step * th * tw), np.float32)
    for j, (oy, ox) in enumerate(offsets):
        lin = (((oy % step) * step + (ox % step)) * th
               + oy // step) * tw + ox // step
        M2[:, lin] += M[:, j]
    return M2


def _surf_eval_f4n8(box, phase):
    """(v (n, S), passed (n,)) from box sums in the (F, 4, n, 8) layout.

    Same math as the (n, F, 32) path but the L2Hys normalize / clamp /
    renormalize / stump dot (ccv_scd.c:502-533) reductions run over axes
    (1, 3) IN PLACE — no (F*4, n*8) -> (n, F, 32) relayout. That
    transpose was a full extra pass over the ~113 MB box tensor per
    phase on the big levels; reductions over split axes are free."""
    w, bias = phase["w"], phase["bias"]
    F, n = box.shape[0], box.shape[2]
    nsq = jnp.sum(box * box, axis=(1, 3))                    # (F, n)
    inv = 1.0 / (jnp.sqrt(nsq) + 1e-6)
    surf = jnp.clip(box * inv[:, None, :, None], -_THETA, _THETA)
    nsq2 = jnp.sum(surf * surf, axis=(1, 3))
    inv2 = 1.0 / (jnp.sqrt(nsq2) + 1e-6)
    # logit = <surf * inv2, w> = <surf, w> * inv2 (inv2 constant per (f,n))
    dot = jnp.sum(surf * w.reshape(F, 4, 1, 8), axis=(1, 3))  # (F, n)
    logit = dot * inv2 + bias[:, None]
    resp = jnp.tanh(0.5 * logit)
    v = resp.T @ phase["onehot"]                              # (n, S)
    passed = jnp.all(v > phase["thresholds"], axis=-1)
    return v, passed


def _box_from_planes(planes, phase, ny: int, nx: int, step: int):
    """Box sums for EVERY grid window DIRECTLY from unit-stride plane
    slices: row f4 = S[c0] - S[c1] - S[c2] + S[c3] where each corner is a
    dense slice of the matching phase plane. No Dt materialization, no
    gather, no matmul — the 4 slice-reads + 3 VPU adds fuse into the
    (F, 4, n, 8) stack write, and the sums are exact in f32 (the same
    corner arithmetic the reference does per window, ccv_scd.c:502-533).
    """
    offsets = np.asarray(phase["offsets"])
    cache: dict = {}

    def corner(j: int):
        got = cache.get(j)
        if got is None:
            oy, ox = int(offsets[j, 0]), int(offsets[j, 1])
            got = jax.lax.slice(
                planes,
                (oy % step, ox % step, oy // step, ox // step, 0),
                (oy % step + 1, ox % step + 1, oy // step + ny,
                 ox // step + nx, 8))[0, 0].reshape(ny * nx, 8)
            cache[j] = got
        return got

    ci = np.asarray(phase["cidx"])  # (F*4, 4)
    rows = [corner(int(c[0])) - corner(int(c[1]))
            - corner(int(c[2])) + corner(int(c[3])) for c in ci]
    return jnp.stack(rows, axis=0).reshape(len(ci) // 4, 4, ny * nx, 8)


def _surf_from_D(D, phase, box_form: str = ""):
    n, nd = D.shape[0], D.shape[1]
    # one (F*4, nd) @ (nd, n*8) matmul — XLA lowers the equivalent einsum
    # 'fd,ndc->nfc' to a much slower batched form
    Dt = D.transpose(1, 0, 2).reshape(nd, n * 8)
    return _surf_from_Dt(Dt, n, phase, box_form)


def _surf_from_Dt(Dt, n, phase, box_form: str = ""):
    M, w, bias = phase["M"], phase["w"], phase["bias"]
    exact = TPU_EXACT_BOX_SUMS and jax.default_backend() != "cpu"
    if exact:
        form = box_form or BOX_SUM_FORM or "take"
        F = w.shape[0]
        if form == "matmul":
            # first-corner centering (mathematically a no-op: every corner
            # row of M sums to zero) shrinks operands from SAT scale ~1e6
            # to box scale ~1e2, then HIGHEST precision (6 bf16 passes)
            # keeps the MXU box sums f32-exact (round-3 form)
            box = jnp.matmul(M, Dt - Dt[0:1, :],
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
        else:
            # every row of M is exactly 4 signed SAT corners, so the box
            # sums ARE 4 f32 row reads of Dt + 3 VPU adds — the same
            # corner arithmetic the reference does per window
            # (ccv_scd.c:502-533), exact in f32 with NO matmul precision
            # passes at all (round-4 form).
            ci = phase["cidx"]
            box = (jnp.take(Dt, ci[:, 0], axis=0)
                   - jnp.take(Dt, ci[:, 1], axis=0)
                   - jnp.take(Dt, ci[:, 2], axis=0)
                   + jnp.take(Dt, ci[:, 3], axis=0))
        return _surf_eval_f4n8(box.reshape(F, 4, n, 8), phase)
    # CPU / non-exact path: byte-identical to the parity-oracle form
    # (the CPU tier's golden gates compare exact confidences)
    prec = None
    box = jnp.matmul(M, Dt, preferred_element_type=jnp.float32,
                     precision=prec)
    F = w.shape[0]
    surf = box.reshape(F, 4, n, 8).transpose(2, 0, 1, 3).reshape(n, F, 32)
    # L2Hys: normalize, clamp, renormalize (ccv_scd.c:502-533)
    inv = 1.0 / (jnp.sqrt(jnp.sum(surf * surf, axis=-1, keepdims=True)) + 1e-6)
    surf = jnp.clip(surf * inv, -_THETA, _THETA)
    inv2 = 1.0 / (jnp.sqrt(jnp.sum(surf * surf, axis=-1, keepdims=True)) + 1e-6)
    surf = surf * inv2
    logit = jnp.einsum("nfk,fk->nf", surf, w, precision=prec) + bias
    resp = jnp.tanh(0.5 * logit)  # (exp(x)-1)/(exp(x)+1)
    v = resp @ phase["onehot"]
    passed = jnp.all(v > phase["thresholds"], axis=-1)
    return v, passed


def _eval_level(sat8, phase_a, phase_b1, phase_b2, all_off, last_count,
                n_stages: int, ny: int, nx: int, step: int,
                K2: int, phase_a_impl=None, K1=None, form: str = ""):
    """Evaluate one pyramid level as a STAGED cascade (up to three phases).

    The reference's per-window early exit (ccv_scd.c:1719-1768) becomes:
    phases A and B1 (the leading ~20% of features) evaluate EVERY window
    DENSELY — unit-stride corner slices + one matmul each, no gather at
    all — and only the big phase-B2 block (the remaining ~80%) runs on a
    compacted survivor buffer. Round-3 profiling showed the old sparse B1
    (K1-capacity tile gather via vmapped dynamic_slice) cost 4.6 ms on the
    base level vs 0.3 ms for an equivalent dense slicing pass: on TPU a
    dense matmul over all 14k windows beats gathering 7% of them. This is
    the dense-tensor answer to data-dependent control flow.

    Returns (idx, passed, conf, counts (2,)) where counts = survivors of
    phase A and of phase A&B1 (for the host-side overflow fallback: only
    count_b1 > K2 requires a full-capacity rerun).
    """
    planes, th, tw = _phase_planes(sat8, ny, nx, int(all_off[:, 0].max()),
                                   int(all_off[:, 1].max()), step)
    if phase_a_impl is not None:
        # autotuned alternative form (the Pallas VPU kernel)
        v_last, pass_a = phase_a_impl(sat8)
    elif form == "slices":
        # box sums straight off the phase planes: no Dt, no gather
        v_a, pass_a = _surf_eval_f4n8(
            _box_from_planes(planes, phase_a, ny, nx, step), phase_a)
        v_last = v_a[:, -1]
    else:
        # phase A covers the full window grid -> dense unit-stride slices
        Dt_a = _grid_corner_slices_T(planes, phase_a["offsets"], ny, nx,
                                     step)
        v_a, pass_a = _surf_from_Dt(Dt_a, ny * nx, phase_a, box_form=form)
        v_last = v_a[:, -1]
    zero = jnp.zeros((), jnp.int32)
    idx = jnp.arange(ny * nx, dtype=jnp.int32)
    if phase_b1 is None:
        # tiny cascade: single phase, "compaction" is just the pass mask
        conf = v_last / last_count + (n_stages - 1)
        return idx, pass_a, conf, jnp.stack(
            [jnp.sum(pass_a, dtype=jnp.int32), zero])
    count_a = jnp.sum(pass_a, dtype=jnp.int32)
    pl = planes.transpose(2, 3, 0, 1, 4)  # (Hs, Ws, step, step, 8)

    def tiles_at(sel, K):
        """Per-survivor contiguous tile extract in the M2 column layout
        (a row gather of 8-float corners runs ~6 GB/s on TPU; contiguous
        (step,step,th,tw,8) block reads don't)."""
        wyx = jnp.stack([sel // nx, sel % nx], axis=1)

        def tile_of(pos):
            return jax.lax.dynamic_slice(
                pl, (pos[0], pos[1], 0, 0, 0), (th, tw, step, step, 8))

        t = jax.vmap(tile_of)(wyx)  # (K, th, tw, step, step, 8)
        return t.transpose(0, 3, 4, 1, 2, 5).reshape(K, -1, 8)

    if jax.default_backend() == "cpu":
        # CPU keeps the SPARSE B1: XLA:CPU runs these level programs on
        # one core where the dense form pays the full feature block for
        # every window (the parity oracles would take minutes per image);
        # compaction via stable argsort (passed-first, ascending index),
        # NOT jnp.nonzero: nonzero lowers to a scatter = sequential
        # K-iteration dynamic-update-slice loop
        if K1 is None:
            K1 = _level_capacity(ny * nx)
        idx1 = jnp.argsort(~pass_a, stable=True)[:K1].astype(jnp.int32)
        tiles = tiles_at(idx1, K1)
        v_b1, pass_b1 = _surf_from_D(tiles, phase_b1[0])
        valid1 = (jnp.arange(K1) < jnp.minimum(count_a, K1)) & pass_a[idx1]
        alive1k = pass_b1 & valid1
        if phase_b2 is None:
            conf = v_b1[:, -1] / last_count + (n_stages - 1)
            return idx1, alive1k, conf, jnp.stack([count_a, zero])
        count_b1 = jnp.sum(alive1k, dtype=jnp.int32)
        r2 = jnp.argsort(~alive1k, stable=True)[:K2].astype(jnp.int32)
        tiles2 = tiles[r2]
        v_b2, pass_b2 = _surf_from_D(tiles2, phase_b2)
        valid2 = (jnp.arange(K2) < jnp.minimum(count_b1, K2)) & alive1k[r2]
        conf = v_b2[:, -1] / last_count + (n_stages - 1)
        return idx1[r2], pass_b2 & valid2, conf, jnp.stack(
            [count_a, count_b1])

    # phase B1 DENSE (TPU): the same unit-stride slicing as phase A over
    # its own corner set; no compaction buffer, no capacity, no overflow.
    # Round-3 profiling: the old sparse B1 (K1-capacity tile gather via
    # vmapped dynamic_slice) cost 4.6 ms on the base level vs ~0.5 ms for
    # the dense slicing+matmul — on TPU a dense matmul over all 14k
    # windows beats gathering 7% of them.
    if form == "slices":
        v_b1, pass_b1 = _surf_eval_f4n8(
            _box_from_planes(planes, phase_b1[1], ny, nx, step),
            phase_b1[1])
    else:
        Dt_b1 = _grid_corner_slices_T(planes, phase_b1[1]["offsets"], ny,
                                      nx, step)
        v_b1, pass_b1 = _surf_from_Dt(Dt_b1, ny * nx, phase_b1[1],
                                      box_form=form)
    alive1 = pass_a & pass_b1
    if phase_b2 is None:
        conf = v_b1[:, -1] / last_count + (n_stages - 1)
        return idx, alive1, conf, jnp.stack([count_a, zero])
    count_b1 = jnp.sum(alive1, dtype=jnp.int32)
    # ONE compaction feeds the big phase-B2 block on survivor tiles
    idx2 = jnp.argsort(~alive1, stable=True)[:K2].astype(jnp.int32)
    tiles2 = tiles_at(idx2, K2)
    v_b2, pass_b2 = _surf_from_D(tiles2, phase_b2, box_form=form)
    # mask padding slots (fill_value=0 would duplicate window 0 if it passed)
    valid2 = (jnp.arange(K2) < jnp.minimum(count_b1, K2)) & alive1[idx2]
    passed = pass_b2 & valid2
    conf = v_b2[:, -1] / last_count + (n_stages - 1)
    return idx2, passed, conf, jnp.stack([count_a, count_b1])


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
        # phase B1 = the next stage block up to _MID_FEATS more features;
        # phase B2 = the rest (most of the cascade, run on ~1% of windows)
        split2 = split
        cum2 = 0
        while (split2 < len(counts)
               and cum2 + counts[split2] <= _MID_FEATS):
            cum2 += counts[split2]
            split2 += 1
        split2 = max(split + 1, split2)
        feats_a = np.nonzero(cascade.stage_of < split)[0]
        feats_b1 = np.nonzero((cascade.stage_of >= split)
                              & (cascade.stage_of < split2))[0]
        feats_b2 = np.nonzero(cascade.stage_of >= split2)[0]
        tabs = dict(
            phase_a=_phase_tables(cascade, feats_a),
            phase_b1=(_phase_tables(cascade, feats_b1)
                      if len(feats_b1) else None),
            phase_b2=(_phase_tables(cascade, feats_b2)
                      if len(feats_b2) else None),
            last_count=float(cascade.stage_counts[-1]))
        # tile bounds are shared by every phase (one plane set per level)
        offs = [tabs[p]["offsets"] for p in ("phase_a", "phase_b1",
                                             "phase_b2") if tabs[p]]
        tabs["all_off"] = np.concatenate(offs)
        object.__setattr__(cascade, "_tables", tabs)
    return tabs


def _full_phase(tabs, cascade: ScdClassifierCascade):
    """Whole-cascade phase tables (every feature, stage-ordered) for the
    full-cascade Pallas kernel; cached on the tables dict."""
    got = tabs.get("phase_full")
    if got is None:
        got = _phase_tables(cascade, np.arange(cascade.n_features))
        tabs["phase_full"] = got
    return got


def _level_capacity(nwin: int) -> int:
    """Fixed phase-B1 buffer size: ~1.3x the worst observed phase-A
    survivor rate (5.4% across the reference samples); detect() falls back
    to K=nwin on (rare) overflow. The tile-gather cost is linear in K, so
    headroom is paid on every call."""
    return int(min(nwin, max(128, nwin // 14)))


def _level_capacity2(nwin: int) -> int:
    """Phase-B2 buffer size: ~2x the worst observed post-B1 survivor rate
    (~1.0%)."""
    return int(min(_level_capacity(nwin), max(64, nwin // 48)))


def _tiled_phase(tabs, name: str, step: int):
    """tabs[name] with its corner matrix remapped onto the per-window tile
    layout (see _tile_selector). Depends only on (cascade, step), so it is
    cached on the tables dict — the remap builds a ~100 MB numpy matrix."""
    phase = tabs[name]
    if phase is None:
        return None
    cached = tabs.get(("tiled", name, step))
    if cached is None:
        all_off = tabs["all_off"]
        th = int(all_off[:, 0].max()) // step + 1
        tw = int(all_off[:, 1].max()) // step + 1
        cached = dict(phase)
        cached["M"] = jnp.asarray(_tile_selector(
            phase["offsets"], th, tw, step, np.asarray(phase["M"])))
        # remap the exact-path corner rows into the same tile-linear
        # domain (rows of the tile-layout Dt)
        off = np.asarray(phase["offsets"])
        lin = ((((off[:, 0] % step) * step + off[:, 1] % step) * th
                + off[:, 0] // step) * tw + off[:, 1] // step)
        cached["cidx"] = jnp.asarray(
            lin.astype(np.int32)[np.asarray(phase["cidx"])])
        tabs[("tiled", name, step)] = cached
    return cached


def _make_level_body(src_shape, rows: int, cols: int, ny: int, nx: int,
                     is_base: bool, cascade: ScdClassifierCascade,
                     step: int, tabs, K2: int,
                     force_phase_a: Optional[str] = None, K1=None):
    """Traceable body for one pyramid level: (optional INTER_AREA resample)
    -> margin pad -> scd_map -> SAT -> staged cascade eval.

    ``force_phase_a`` selects the exact-mode evaluation form:
      - "slices": box sums built directly from plane slices for phases
        A + B1 (no Dt, no gather, no matmul; round-5 form);
      - "xla": Dt corner slices + 4 f32 row-takes (round-4 form);
      - "matmul": Dt + first-corner-centered HIGHEST matmul (round-3);
      - "pallas": the VPU kernel for phase A, row-takes for B1/B2.
    The MEASURED choice between them happens one level up, per OCTAVE
    program (_get_octave_fn) — the deployable unit — so autotune compiles
    the variants once per octave and the measured winner IS the
    production program."""
    margin = cascade.margin
    n_stages = cascade.n_stages

    phase_a = tabs["phase_a"]
    # B1 needs both forms: the tile-remapped matrix for the CPU sparse
    # path, the raw offset form for the TPU dense slicing path
    phase_b1 = None if tabs["phase_b1"] is None else (
        _tiled_phase(tabs, "phase_b1", step), tabs["phase_b1"])
    phase_b2 = _tiled_phase(tabs, "phase_b2", step)

    phase_a_impl = None
    form = force_phase_a or ""
    if force_phase_a == "pallas":
        from ccv_tpu.ops.pallas import scd_phase
        all_off = tabs["all_off"]
        _th = int(all_off[:, 0].max()) // step + 1
        _tw = int(all_off[:, 1].max()) // step + 1
        form = ""  # B1/B2 keep the take form under the pallas-A variant

        def phase_a_impl(sat8):
            return scd_phase.phase_a(sat8, phase_a, step, ny, nx, _th, _tw)
    elif force_phase_a == "xla":
        form = ""  # take

    def level(src, last_count):
        image = src if is_base else resample.resample(
            src, rows=rows, cols=cols, rows_scale=rows / src.shape[0],
            cols_scale=cols / src.shape[1], interp=resample.INTER_AREA)
        if any(margin):
            pads = [(margin[1], margin[3]), (margin[0], margin[2]), (0, 0)]
            image = jnp.pad(image, pads)
        smap = scd_map(image)
        # sat_mxu: the scan-based SAT lowers to a serial row-loop on TPU
        # (~2-3 ms/level); the triangular-matmul form is one MXU pass
        sat8 = algebra.sat_mxu(smap[..., :8],
                               padding=algebra.PADDING_ZERO)
        return _eval_level(sat8, phase_a, phase_b1, phase_b2,
                           tabs["all_off"], last_count, n_stages,
                           ny=ny, nx=nx, step=step, K2=K2,
                           phase_a_impl=phase_a_impl, K1=K1, form=form)

    return level


def _out_len(tabs, nwin: int, K2: int) -> int:
    """Length of a level program's output arrays. On TPU phases A and B1
    are dense -> full-grid outputs and only B2 compacts to K2; the CPU
    sparse-B1 path compacts B2-less cascades to its K1 buffer."""
    if tabs["phase_b1"] is None:
        return nwin
    if tabs["phase_b2"] is None:
        return (_level_capacity(nwin) if jax.default_backend() == "cpu"
                else nwin)
    return K2


def _get_level_fn(src_shape, rows: int, cols: int, ny: int, nx: int,
                  is_base: bool, cascade: ScdClassifierCascade,
                  step: int, tabs, K2: int, batch: bool = False, K1=None):
    # id(cascade) matters: the phase tables (weights/thresholds) are traced
    # into the program as constants, so same-geometry cascades with
    # different weights must NOT share compiled programs
    key = (id(cascade), src_shape, rows, cols, ny, nx, is_base, step,
           K2, batch, K1)
    fn = _LEVEL_CACHE.get(key)
    if fn is not None:
        return fn
    level = _make_level_body(src_shape, rows, cols, ny, nx, is_base,
                             cascade, step, tabs, K2, K1=K1)
    fn = jax.jit(jax.vmap(level, in_axes=(0, None)) if batch else level)
    _LEVEL_CACHE[key] = fn
    return fn


def _cascade_sig(cascade, tabs) -> str:
    """Stable content hash of a cascade's tables (the ccv `sig` analog,
    ccv.h's cached-signature convention) for cross-process AOT keys."""
    sig = tabs.get("sig")
    if sig is None:
        import hashlib
        h = hashlib.sha256()
        h.update(f"{cascade.width}x{cascade.height}m{cascade.margin}"
                 .encode())
        for arr in (cascade.stage_counts, cascade.thresholds, cascade.sx,
                    cascade.sy, cascade.dx, cascade.dy, cascade.bias,
                    cascade.w, cascade.stage_of):
            h.update(np.ascontiguousarray(arr).tobytes())
        sig = h.hexdigest()[:16]
        tabs["sig"] = sig
    return sig


class _AotJit:
    """Lazy AOT-cached octave program: holds the jitted fn + a stable
    key; the first call loads the serialized PJRT executable from
    nn/aotcache or compiles and persists it. Exists because XLA's own
    persistent-cache key is unstable across processes for the biggest
    whole-octave Mosaic program (measured round 5: identical StableHLO,
    fresh ~10 min compile every process)."""

    def __init__(self, jitfn, key: str):
        self._fn, self._key = jitfn, key
        self._compiled = {}   # call signature -> jax.stages.Compiled
        import threading
        self._lock = threading.Lock()

    def lower(self, *args):
        # pre-jitted contract for nn/autotune._time_variant: without
        # this, autotune wraps the object in jax.jit and traces the
        # compiled executable's __call__ — which raises, scoring the
        # variant inf (round 5: bench chose slices over a 3x-faster
        # pallas_full because of exactly that)
        return self._fn.lower(*args)

    @staticmethod
    def _sig(args):
        def one(a):
            if not hasattr(a, "dtype"):
                # weak-typed Python scalars jit like f32/i32 zero-dim args
                a = jnp.asarray(a)
            return f"{jnp.dtype(a.dtype).name}{tuple(a.shape)}"
        return "+".join(one(a) for a in args)

    def cached(self, *args) -> bool:
        """True when the serialized executable for this call signature is
        already on disk (a call will LOAD in ~1 s rather than compile for
        minutes)."""
        sig = self._sig(args)
        if sig in self._compiled:
            return True
        from ccv_tpu.nn import aotcache
        return aotcache.entry_exists(f"{self._key}|{sig}")

    def __call__(self, *args):
        sig = self._sig(args)
        c = self._compiled.get(sig)
        if c is None:
            with self._lock:
                c = self._compiled.get(sig)
                if c is None:
                    from ccv_tpu.nn import aotcache
                    c = aotcache.load_or_compile(
                        self._fn, args, f"{self._key}|{sig}",
                        aotcache.STATS)
                    self._compiled[sig] = c
        return c(*args)


def _build_octave_pallas_full(src_shape, lspecs, cascade, step, tabs,
                              has_next: bool, batch: bool,
                              dtype=jnp.float32):
    """Whole-octave program for the full-cascade Pallas kernel: the
    per-level XLA prolog (INTER_AREA resample -> margin pad -> channels-
    first SURF map -> SAT -> phase planes) feeds ONE kernel call with a
    (L, gy, gx) grid (ops/pallas/scd_cascade.cascade_eval_levels), then a
    per-level top_k compacts survivors to the same K2-row rows the staged
    forms emit. One Mosaic module per octave instead of one per level —
    the per-level form was 26 MB of StableHLO and a ~17 min compile for
    the base octave."""
    from ccv_tpu.ops.pallas import scd_cascade

    margin = cascade.margin
    n_stages = cascade.n_stages
    all_off = tabs["all_off"]
    th = int(all_off[:, 0].max()) // step + 1
    tw = int(all_off[:, 1].max()) // step + 1
    gy, gx = scd_cascade.pad_dims(
        max(ny for (_k, _r, _c, ny, _nx) in lspecs),
        max(nx for (_k, _r, _c, _ny, nx) in lspecs), th, tw)[:2]
    _, _, hs_pad, ws_pad = scd_cascade.pad_dims(
        gy * scd_cascade.BY, gx * scd_cascade.BX, th, tw)
    full = _full_phase(tabs, cascade)
    has_b2 = tabs["phase_b2"] is not None
    dims = np.asarray([(ny, nx) for (_k, _r, _c, ny, nx) in lspecs],
                      np.int32)

    def prolog(src):
        """(L, step*step, 8, hs_pad, ws_pad) phase planes for one image."""
        planes_l = []
        for (k, rows, cols, ny, nx) in lspecs:
            image = src if k == 0 else resample.resample(
                src, rows=rows, cols=cols, rows_scale=rows / src.shape[0],
                cols_scale=cols / src.shape[1],
                interp=resample.INTER_AREA)
            if any(margin):
                pads = [(margin[1], margin[3]), (margin[0], margin[2]),
                        (0, 0)]
                image = jnp.pad(image, pads)
            sat8 = _sat_cf8(scd_map_cf8(image))
            planes_l.append(_planes_cf(sat8, hs_pad, ws_pad, step))
        return jnp.stack(planes_l)

    def postlog(conf_g, passed_g, last_count):
        """Kernel grids -> the packed (idx, passed, conf) rows + counts
        the staged forms emit, one image."""
        rows_all, counts = [], []
        for li, (k, rows, cols, ny, nx) in enumerate(lspecs):
            passed = passed_g[li, :ny, :nx].reshape(ny * nx)
            conf = (conf_g[li, :ny, :nx].reshape(ny * nx) / last_count
                    + (n_stages - 1))
            count = jnp.sum(passed, dtype=jnp.int32)
            if not has_b2:
                idx = jnp.arange(ny * nx, dtype=jnp.int32)
                count2 = jnp.stack([count, jnp.zeros((), jnp.int32)])
            else:
                # compact to the same K2-row output the staged forms
                # emit (top_k of the 0/1 mask = first K2 survivors in
                # window order; ties favor lower indices)
                K2 = _level_capacity2(ny * nx)
                vals, idx2 = jax.lax.top_k(passed.astype(jnp.float32),
                                           K2)
                idx, passed, conf = (idx2.astype(jnp.int32), vals > 0.0,
                                     conf[idx2])
                count2 = jnp.stack([count, count])
            rows_all.append(jnp.stack([idx.astype(jnp.float32),
                                       passed.astype(jnp.float32),
                                       conf.astype(jnp.float32)], axis=1))
            counts.append(count2.astype(jnp.float32))
        return jnp.concatenate(rows_all, axis=0), jnp.stack(counts)

    def octave(src, last_count):
        conf_g, passed_g = scd_cascade.cascade_eval_levels(
            prolog(src), full, step, dims, th, tw, gy, gx)
        packed, cnts = postlog(conf_g, passed_g, last_count)
        nxt = resample.sample_down(src) if has_next else jnp.zeros(
            (), jnp.float32)
        return packed, cnts, nxt

    L = len(lspecs)

    def batched(srcs, last_count):
        # the whole batch's levels ride the kernel's level axis: ONE
        # pallas_call (grid (B*L, gy, gx)) per octave for B images —
        # the XLA prolog/postlog vmap, the kernel itself needs no
        # batching rule
        B = srcs.shape[0]
        pls = jax.vmap(prolog)(srcs)
        flat = pls.reshape((B * L,) + pls.shape[2:])
        conf, passed = scd_cascade.cascade_eval_levels(
            flat, full, step, np.tile(dims, (B, 1)), th, tw, gy, gx)
        conf = conf.reshape((B, L) + conf.shape[1:])
        passed = passed.reshape((B, L) + passed.shape[1:])
        packed, cnts = jax.vmap(postlog, in_axes=(0, 0, None))(
            conf, passed, last_count)
        nxt = (jax.vmap(resample.sample_down)(srcs) if has_next
               else jnp.zeros((), jnp.float32))
        return packed, cnts, nxt

    from ccv_tpu.ops.pallas.scd_cascade import KERNEL_VERSION
    aot_key = (f"scd_octave_pf{KERNEL_VERSION}|{src_shape}|"
               f"{jnp.dtype(dtype).name}|"
               f"{tuple(lspecs)}|s{step}|{_cascade_sig(cascade, tabs)}|"
               f"hn{int(has_next)}|b{int(batch)}")
    return _AotJit(jax.jit(batched if batch else octave), aot_key)


def _octave_builder(src_shape, lspecs, cascade: ScdClassifierCascade,
                    step: int, tabs, has_next: bool, batch: bool = False,
                    dtype=jnp.float32):
    """Returns build(form) -> callable whole-octave program: "slices" /
    "xla" / "matmul" / "pallas" build jitted staged-phase programs with
    that phase-A box-sum form; "pallas_full" builds the single
    multi-level full-cascade kernel program (AOT-cached); None = the
    non-exact default. Programs specialize on `dtype` — the production
    pyramid dtype (uint8 for image inputs)."""

    def build(force_phase_a):
        if force_phase_a == "pallas_full":
            return _build_octave_pallas_full(src_shape, lspecs, cascade,
                                             step, tabs, has_next, batch,
                                             dtype)
        bodies = [
            _make_level_body(src_shape, rows, cols, ny, nx, k == 0, cascade,
                             step, tabs, K2=_level_capacity2(ny * nx),
                             force_phase_a=force_phase_a)
            for (k, rows, cols, ny, nx) in lspecs
        ]

        def octave(src, last_count):
            rows_all, counts = [], []
            for body in bodies:
                idx, passed, conf, count2 = body(src, last_count)
                rows_all.append(jnp.stack([idx.astype(jnp.float32),
                                           passed.astype(jnp.float32),
                                           conf.astype(jnp.float32)],
                                          axis=1))
                counts.append(count2.astype(jnp.float32))
            packed = jnp.concatenate(rows_all, axis=0)
            cnts = jnp.stack(counts)  # (L, 2)
            nxt = resample.sample_down(src) if has_next else jnp.zeros(
                (), jnp.float32)
            return packed, cnts, nxt

        if batch:
            # one dispatch per octave for the WHOLE image batch: B x the
            # per-program work of the single path, so the tiny upper-pyramid
            # levels stop being dispatch-bound
            if str(force_phase_a).startswith("pallas"):
                # pallas_call with a manually-DMA'd ANY-space input has no
                # vmap batching rule (Mosaic requires whole-array blocks
                # there); lax.map keeps the one-dispatch-per-octave batch
                # contract and runs the kernel per image inside the program
                def batched(srcs, last_count):
                    return jax.lax.map(lambda s: octave(s, last_count),
                                       srcs)
                return jax.jit(batched)
            return jax.jit(jax.vmap(octave, in_axes=(0, None),
                                    out_axes=(0, 0, 0 if has_next else None)))
        return jax.jit(octave)

    return build


def _get_octave_fn(src_shape, lspecs, cascade: ScdClassifierCascade,
                   step: int, tabs, has_next: bool, batch: bool = False,
                   dtype=jnp.float32):
    """ONE jitted program for a whole octave: every level of the octave
    (sharing the octave source) + the sample_down to the next octave, with
    the levels' outputs packed into a single rows array. Each program
    dispatch costs ~0.5 ms over the device tunnel, so 19 level + 3 pyramid
    dispatches per image fused down to one per octave is ~10 ms/image.
    (Round 1 fused the ENTIRE pyramid into one program and hit a 17.5 MB
    MLIR module that killed the compiler; one octave stays small.)"""
    dtype = jnp.dtype(dtype)
    key = (id(cascade), src_shape, tuple(lspecs), step, has_next, batch,
           dtype.name)
    fn = _LEVEL_CACHE.get(key)
    if fn is not None:
        return fn
    build = _octave_builder(src_shape, lspecs, cascade, step, tabs,
                            has_next, batch, dtype)

    # Exact mode on TPU: the phase-A form (centered-XLA vs Pallas) is a
    # MEASURED per-octave decision (nn/autotune, the ccv_nnc_cmd_autotune
    # analog, cmd.c:344-577), benchmarked as the whole fused octave program
    # — the deployable unit — and the measured jitted winner is reused as
    # the production program (no recompile).
    exact = TPU_EXACT_BOX_SUMS and jax.default_backend() != "cpu"
    forced = _os.environ.get("CCV_TPU_SCD_OCTAVE_FORM")
    if exact and forced:
        # A/B experiments: pin the octave form, bypass autotune (the
        # variant table keeps prewarm and production on ONE jit object)
        fn = _octave_variants(key, build, (forced,))[forced]
        _LEVEL_CACHE[key] = fn
        return fn
    if exact:
        from ccv_tpu.nn import autotune
        extra = _octave_extra(lspecs, cascade, step, batch)
        args = (jnp.zeros(src_shape, dtype),
                jnp.zeros((), jnp.float32))
        if batch:
            # reuse the single-image octave's measured choice (same
            # geometry, avoids compiling 2 batched variants); on a cache
            # miss (batch-first workload) MEASURE the single-image
            # variants as the geometry proxy instead of silently locking
            # in a default
            args1 = (jnp.zeros(src_shape, dtype),
                     jnp.zeros((), jnp.float32))
            extra1 = _octave_extra(lspecs, cascade, step, False)
            name = autotune.recorded("scd_octave_exact", args1, extra=extra1)
            if name is None:
                key1 = (id(cascade), src_shape, tuple(
                    (k, r, c, ny, nx) for (k, r, c, ny, nx) in lspecs),
                    step, has_next, False, dtype.name)
                build1 = _octave_builder(src_shape, lspecs, cascade, step,
                                         tabs, has_next, False, dtype)
                autotune.choose("scd_octave_exact",
                                _octave_variants(key1, build1), args1,
                                default="slices", extra=extra1)
                name = autotune.recorded("scd_octave_exact", args1,
                                         extra=extra1)
            fn = build(name or "slices")
        else:
            variants = _octave_variants(key, build)
            fn = autotune.choose("scd_octave_exact", variants, args,
                                 default="slices", extra=extra)
            winner = autotune.recorded("scd_octave_exact", args, extra=extra)
            if winner is not None:
                # evict the losing variant: a whole-octave program + its
                # traced-in device tables is ~100 MB that would otherwise
                # live in _LEVEL_CACHE forever
                vd = _LEVEL_CACHE.get(("variants",) + key)
                if vd:
                    for nm in [n for n in vd if n != winner]:
                        vd.pop(nm)
    else:
        fn = build(None)
    _LEVEL_CACHE[key] = fn
    return fn


def _octave_extra(lspecs, cascade, step: int, batch: bool) -> str:
    geom = "o" + ";".join(f"{r}x{c}g{ny}x{nx}"
                          for (_k, r, c, ny, nx) in lspecs)
    # v4 = the full-cascade per-block-early-exit Pallas kernel joined and
    # the losing round-3/4 forms (xla/matmul/pallas phase-A) left the
    # measured set (they lost at every octave geometry in the v3
    # measurements; still available via CCV_TPU_SCD_BOX_FORM for A/B).
    # v5 = pallas_full became ONE multi-level kernel per octave (grid
    # (L, gy, gx)) and programs specialize on the production src dtype —
    # v4's per-level-kernel timings don't describe the new program.
    return f"{geom}s{step}n{len(cascade.stage_counts)}b{int(batch)}v5"


# exact-mode evaluation forms measured per octave (see _make_level_body)
_OCTAVE_FORMS = ("slices", "pallas_full")


def _octave_variants(key, build, names=None):
    """Memoized {name: jitted fn} for one octave's exact-form variants —
    the SAME objects flow through prewarm, autotune measurement and
    production dispatch, so each variant compiles at most once."""
    vkey = ("variants",) + key
    got = _LEVEL_CACHE.setdefault(vkey, {})
    for name in (names or _OCTAVE_FORMS):
        if name not in got:
            got[name] = build(name)
    return got


def _prewarm_octave_fns(oct_work, cascade, step, tabs):
    """Compile every still-cold octave program CONCURRENTLY before the
    first dispatch. A whole-octave exact program takes ~2 min to compile
    through the tunneled backend; six serial variant compiles measured
    741 s of cold detect wall. Threads overlap the compiles (XLA releases
    the GIL); on a warm autotune cache only each octave's recorded winner
    is compiled."""
    from concurrent.futures import ThreadPoolExecutor

    from ccv_tpu.nn import autotune

    jobs = []  # (jitted fn, args)
    for (src_shape, lspecs, has_next, dtype) in oct_work:
        dtype = jnp.dtype(dtype)
        key = (id(cascade), src_shape, tuple(lspecs), step, has_next, False,
           dtype.name)
        if _LEVEL_CACHE.get(key) is not None:
            continue
        build = _octave_builder(src_shape, lspecs, cascade, step, tabs,
                                has_next, False, dtype)
        args = (jnp.zeros(src_shape, dtype),
                jnp.zeros((), jnp.float32))
        forced = _os.environ.get("CCV_TPU_SCD_OCTAVE_FORM")
        if forced:
            jobs.append((_octave_variants(key, build, (forced,))[forced],
                         args))
            continue
        variants = _octave_variants(key, build)
        name = autotune.recorded("scd_octave_exact", args,
                                 extra=_octave_extra(lspecs, cascade, step,
                                                     False))
        if name in variants:
            jobs.append((variants[name], args))
        else:
            jobs.extend((fn, args) for fn in variants.values())
    # WARM AOT-cached programs (pallas_full) load their serialized
    # executable in ~1 s each but CONCURRENT deserialize RPCs wedge the
    # tunneled device for minutes (round 5: 327 s first-detect vs 7 s
    # serial) — run those serially; real compiles (jit variants and cold
    # AOT) overlap in threads as before
    aot_jobs = [ja for ja in jobs
                if isinstance(ja[0], _AotJit) and ja[0].cached(*ja[1])]
    jit_jobs = [ja for ja in jobs if ja not in aot_jobs]
    if len(jit_jobs) > 1:
        with ThreadPoolExecutor(max_workers=len(jit_jobs)) as ex:
            futs = [ex.submit(lambda ja=ja: jax.block_until_ready(
                ja[0](*ja[1]))) for ja in jit_jobs]
            for ja in aot_jobs:
                jax.block_until_ready(ja[0](*ja[1]))
            for f in futs:
                f.result()
    else:
        for ja in jit_jobs + aot_jobs:
            jax.block_until_ready(ja[0](*ja[1]))


def detect_async(img, cascade: ScdClassifierCascade,
                 params: Optional[ScdParams] = None):
    """Dispatch the full pyramid + cascade for one image WITHOUT waiting;
    returns a handle for detect_collect. Lets callers pipeline images so
    the host<->device round trip of one image overlaps the next image's
    compute (the throughput path the batched-benchmark uses)."""
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
    # one fused program per octave (all its levels + the next sample_down),
    # then one pack program -> the host fetches a SINGLE buffer per image
    # (every extra fetched buffer costs ~1-3 ms over the device tunnel)
    by_octave: dict = {}
    for (octave, k, rows, cols, ny, nx, scale) in specs:
        by_octave.setdefault(octave, []).append((k, rows, cols, ny, nx))
    pyr = [jnp.asarray(a)]
    pieces = []
    src = pyr[0]
    if TPU_EXACT_BOX_SUMS and jax.default_backend() != "cpu":
        # octave shapes are known up front (sample_down halves H and W):
        # compile every cold octave program concurrently instead of paying
        # ~2 min of tunneled-compiler wall per octave serially
        oct_work, shp = [], tuple(src.shape)
        for octave in range(scale_upto):
            lspecs = by_octave.get(octave, [])
            if lspecs:
                oct_work.append((shp, lspecs, octave < scale_upto - 1,
                                 src.dtype))
            shp = (shp[0] // 2, shp[1] // 2) + shp[2:]
        _prewarm_octave_fns(oct_work, cascade, step, tabs)
    for octave in range(scale_upto):
        lspecs = by_octave.get(octave, [])
        has_next = octave < scale_upto - 1
        if not lspecs:
            if has_next:
                src = _sample_down_jit(src)
                pyr.append(src)
            continue
        fn = _get_octave_fn(tuple(src.shape), lspecs, cascade, step, tabs,
                            has_next, dtype=src.dtype)
        packed, cnts, nxt = fn(src, tabs["last_count"])
        pieces.append((packed, cnts))
        if has_next:
            src = nxt
            pyr.append(src)
    lens = tuple(_out_len(tabs, ny * nx, _level_capacity2(ny * nx))
                 for (octave, k, rows, cols, ny, nx, scale) in specs)
    shapes = tuple(int(p.shape[0]) for p, c in pieces)
    packed = _get_pack_fn(shapes)(tuple(x for pc in pieces for x in pc))
    try:
        # start the device->host copy NOW: over the tunneled device a
        # sync fetch costs a full ~33 ms RTT; issuing the copy at dispatch
        # time lets pipelined callers overlap RTTs (measured 46 -> 36
        # ms/image on the throughput benchmark)
        packed.copy_to_host_async()
    except AttributeError:
        pass
    return (packed, lens, specs, pyr, up_ratio, eff_w, eff_h, step, cascade,
            tabs, params)


_PACK_CACHE: dict = {}


def _get_pack_fn(shapes, batch: bool = False):
    """Jitted packer: the per-octave (rows (Ko, 3), counts (Lo, 2)) pairs
    -> one (sum(Ko) + L, 3) float32 array with the count pairs appended as
    trailing rows (idx/count values stay exact in f32: < 2^24). With
    batch=True every piece carries a leading image axis and the pack runs
    along axis 1."""
    key = (shapes, batch)
    fn = _PACK_CACHE.get(key)
    if fn is not None:
        return fn
    ax = 1 if batch else 0

    def pack(flat):
        rows = [flat[2 * i] for i in range(len(flat) // 2)]
        cnts = jnp.concatenate([flat[2 * i + 1]
                                for i in range(len(flat) // 2)], axis=ax)
        z = jnp.zeros(cnts.shape[:-1] + (1,), cnts.dtype)
        return jnp.concatenate(rows + [jnp.concatenate([cnts, z], axis=-1)],
                               axis=ax)

    fn = jax.jit(pack)
    _PACK_CACHE[key] = fn
    return fn


def _split_rows(arr: np.ndarray, lens):
    """Packed (sum(lens)+L, 3) -> per-spec (idx, passed, conf, count2)."""
    counts = arr[sum(lens):, :2]
    offs = np.concatenate([[0], np.cumsum(lens)])
    return [(arr[offs[i]:offs[i + 1], 0].astype(np.int32),
             arr[offs[i]:offs[i + 1], 1] != 0.0,
             arr[offs[i]:offs[i + 1], 2],
             counts[i]) for i in range(len(lens))]


def _comps_from_levels(outs, specs, up_ratio, eff_w, eff_h, step, rerun):
    """Host edge: per-level survivor rows -> Comp list. `rerun(spec)` is
    the full-capacity fallback for (rare) compaction overflow."""
    comps: List[Comp] = []
    for spec, (idx, passed, conf, count2) in zip(specs, outs):
        (octave, k, rows, cols, ny, nx, scale) = spec
        K2 = _level_capacity2(ny * nx)
        overflow = int(count2[1]) > K2
        if jax.default_backend() == "cpu":
            # only the CPU sparse-B1 path has a K1 capacity to overflow
            overflow = overflow or int(count2[0]) > _level_capacity(ny * nx)
        if overflow:
            idx, passed, conf, count2 = rerun(spec)
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
    return comps


def detect_collect(handle) -> List[Comp]:
    """Wait for a detect_async dispatch and run the host-edge grouping."""
    (packed, lens, specs, pyr, up_ratio, eff_w, eff_h, step, cascade, tabs,
     params) = handle
    arr = np.asarray(packed)  # the ONE host<->device round trip
    outs = _split_rows(arr, lens)

    def rerun(spec):
        # compaction overflow (rare): rerun this level at full capacity
        (octave, k, rows, cols, ny, nx, scale) = spec
        src = pyr[octave]
        fn = _get_level_fn(tuple(src.shape), rows, cols, ny, nx, k == 0,
                           cascade, step, tabs, K2=ny * nx, K1=ny * nx)
        return jax.device_get(fn(src, tabs["last_count"]))

    comps = _comps_from_levels(outs, specs, up_ratio, eff_w, eff_h, step,
                               rerun)
    return merge_detections(comps, params.min_neighbors)


def detect(img, cascade: ScdClassifierCascade,
           params: Optional[ScdParams] = None) -> List[Comp]:
    """ccv_scd_detect_objects twin (ccv_scd.c:1653) for a single cascade.

    The octave chain (sample_down) and each pyramid level (INTER_AREA
    resample -> SURF map -> SAT -> every window's cascade evaluation) run
    as small per-level jitted XLA programs, dispatched asynchronously; the
    surviving-window masks come back to the host at the end."""
    return detect_collect(detect_async(img, cascade, params))


_sample_down_batch = jax.jit(jax.vmap(resample.sample_down))


def detect_batch(imgs, cascade: ScdClassifierCascade,
                 params: Optional[ScdParams] = None) -> List[List[Comp]]:
    """Batched ccv_scd_detect_objects: (B, H, W, C) same-shape images
    through BATCHED octave-fused programs — one device dispatch per
    octave for the whole batch, one packed buffer fetch total (the
    CMU-test-set-style batch benchmark shape). B x the per-program work
    of the single-image path, so the tiny upper-pyramid levels stop
    being dispatch-bound."""
    params = params or ScdParams()
    a = jnp.asarray(imgs)
    assert a.ndim == 4, "detect_batch expects (B, H, W, C)"
    B, H, W = a.shape[0], a.shape[1], a.shape[2]
    size_w, size_h = params.size
    up_ratio = max(1.0, cascade.width / size_w, cascade.height / size_h)
    assert up_ratio - 1.0 <= 1e-4, "up-scaling batch path not implemented"
    eff_h = cascade.height - cascade.margin[1] - cascade.margin[3]
    eff_w = cascade.width - cascade.margin[0] - cascade.margin[2]
    specs, scale_upto = _level_specs(H, W, cascade, params)
    step = params.step_through
    tabs = _cascade_tables(cascade)
    by_octave: dict = {}
    for (octave, k, rows, cols, ny, nx, scale) in specs:
        by_octave.setdefault(octave, []).append((k, rows, cols, ny, nx))
    pyr = [a]
    pieces = []
    src = a
    for octave in range(scale_upto):
        lspecs = by_octave.get(octave, [])
        has_next = octave < scale_upto - 1
        if not lspecs:
            if has_next:
                src = _sample_down_batch(src)
                pyr.append(src)
            continue
        fn = _get_octave_fn(tuple(src.shape[1:]), lspecs, cascade, step,
                            tabs, has_next, batch=True, dtype=src.dtype)
        packed_o, cnts, nxt = fn(src, tabs["last_count"])
        pieces.append((packed_o, cnts))
        if has_next:
            src = nxt
            pyr.append(src)
    lens = tuple(_out_len(tabs, ny * nx, _level_capacity2(ny * nx))
                 for (octave, k, rows, cols, ny, nx, scale) in specs)
    shapes = tuple(int(p.shape[1]) for p, c in pieces)
    packed = _get_pack_fn(shapes, batch=True)(
        tuple(x for pc in pieces for x in pc))
    arr = np.asarray(packed)  # ONE fetch for the whole batch

    results: List[List[Comp]] = []
    for b in range(B):
        outs = _split_rows(arr[b], lens)

        def rerun(spec, _b=b):
            (octave, k, rows, cols, ny, nx, scale) = spec
            src_b = pyr[octave][_b]
            fn = _get_level_fn(tuple(src_b.shape), rows, cols, ny, nx,
                               k == 0, cascade, step, tabs, K2=ny * nx,
                               K1=ny * nx)
            return jax.device_get(fn(src_b, tabs["last_count"]))

        comps = _comps_from_levels(outs, specs, up_ratio, eff_w, eff_h,
                                   step, rerun)
        results.append(merge_detections(comps, params.min_neighbors))
    return results
