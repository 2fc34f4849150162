"""BBF (brightness binary feature) face detector (reference: lib/ccv_bbf.c).

Features compare min(bright points) > max(dark points) across a 3-level
multi-resolution pyramid triple (full/half/quarter of the detection window,
_ccv_run_bbf_feature, ccv_bbf.c:25). TPU redesign: all windows of a scale
form a regular grid over the quarter-resolution image, so every feature
point read is a gather off one of three flattened pyramid levels; min/max
and the stage sums are dense batched reductions with the early exit as an
all-prefixes mask.
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.detectors.common import Comp, group
from ccv_tpu.ops import resample


@dataclasses.dataclass
class BbfParams:
    """ccv_bbf_default_params twin (ccv_bbf.c:12)."""

    interval: int = 5
    min_neighbors: int = 2
    accurate: bool = True
    size: tuple = (24, 24)


@dataclasses.dataclass
class BbfCascade:
    width: int
    height: int
    # flattened features over all stages:
    stage_of: np.ndarray     # (F,)
    n_stages: int
    thresholds: np.ndarray   # (S,)
    alphas: np.ndarray       # (F, 2)
    px: np.ndarray           # (F, 8) -1-padded
    py: np.ndarray
    pz: np.ndarray
    nx: np.ndarray
    ny: np.ndarray
    nz: np.ndarray


def load_cascade(directory: str) -> BbfCascade:
    """ccv_bbf_read_classifier_cascade twin (text files per stage)."""
    import struct as _struct

    def as_float(i):
        return _struct.unpack("<f", _struct.pack("<i", i))[0]

    with open(os.path.join(directory, "cascade.txt")) as f:
        count, w, h = (int(t) for t in f.read().split()[:3])
    stage_of, thresholds, alphas = [], [], []
    px, py, pz, nx, ny, nz = [], [], [], [], [], []
    for s in range(count):
        path = os.path.join(directory, f"stage-{s}.txt")
        if not os.path.exists(path):
            count = s
            break
        toks = open(path).read().split()
        pos = 0

        def rd(n=1):
            nonlocal pos
            o = toks[pos:pos + n]
            pos += n
            return o

        fcount = int(rd(1)[0])
        thresholds.append(as_float(int(rd(1)[0])))
        for _ in range(fcount):
            size = int(rd(1)[0])
            fpx = [-1] * 8
            fpy = [0] * 8
            fpz = [-1] * 8
            fnx = [-1] * 8
            fny = [0] * 8
            fnz = [-1] * 8
            for j in range(size):
                a, b, c = (int(t) for t in rd(3))
                fpx[j], fpy[j], fpz[j] = a, b, c
                a, b, c = (int(t) for t in rd(3))
                fnx[j], fny[j], fnz[j] = a, b, c
            a0, a1 = (as_float(int(t)) for t in rd(2))
            stage_of.append(s)
            alphas.append((a0, a1))
            px.append(fpx)
            py.append(fpy)
            pz.append(fpz)
            nx.append(fnx)
            ny.append(fny)
            nz.append(fnz)
    return BbfCascade(
        width=w, height=h, stage_of=np.array(stage_of, np.int32),
        n_stages=count, thresholds=np.array(thresholds, np.float32),
        alphas=np.array(alphas, np.float32),
        px=np.array(px, np.int32), py=np.array(py, np.int32),
        pz=np.array(pz, np.int32), nx=np.array(nx, np.int32),
        ny=np.array(ny, np.int32), nz=np.array(nz, np.int32))


@partial(jax.jit, static_argnames=("ny_", "nx_", "shapes"))
def _eval_scale(full, half, quarter, tables, thresholds, alphas, onehot,
                ny_: int, nx_: int, shapes):
    """Evaluate all windows on one scale triple.

    Window (y, x) on the quarter grid covers full[4y:4y+H, 4x:4x+W].
    tables: per-point (offset-into-level, level-id, is_positive, feature-id)
    encoded as dense arrays; see _prepare_tables.
    """
    (off0, off1, off2, mask0, mask1, mask2, pos0, pos1, pos2) = tables
    f0 = full.reshape(-1).astype(jnp.int32)
    f1 = half.reshape(-1).astype(jnp.int32)
    f2 = quarter.reshape(-1).astype(jnp.int32)
    W0, W1, W2 = shapes
    iy = jnp.arange(ny_, dtype=jnp.int32)
    ix = jnp.arange(nx_, dtype=jnp.int32)
    base0 = ((iy[:, None] * 4) * W0 + ix[None, :] * 4).reshape(-1)
    base1 = ((iy[:, None] * 2) * W1 + ix[None, :] * 2).reshape(-1)
    base2 = (iy[:, None] * W2 + ix[None, :]).reshape(-1)

    def level_minmax(flat, base, off, mask, pos):
        # off/mask/pos: (F, 8); gather (nwin, F, 8)
        g = flat[(base[:, None, None] + off[None]) % flat.shape[0]]
        gp = jnp.where(mask & pos, g, 256)   # min over positive points
        gn = jnp.where(mask & ~pos, g, -1)   # max over negative points
        return gp.min(-1), gn.max(-1)

    p0, n0 = level_minmax(f0, base0, off0, mask0, pos0)
    p1, n1 = level_minmax(f1, base1, off1, mask1, pos1)
    p2, n2 = level_minmax(f2, base2, off2, mask2, pos2)
    pmin = jnp.minimum(jnp.minimum(p0, p1), p2)
    nmax = jnp.maximum(jnp.maximum(n0, n1), n2)
    r = (pmin > nmax).astype(jnp.int32)  # (nwin, F)
    contrib = jnp.where(r > 0, alphas[:, 1], alphas[:, 0])
    sums = contrib @ onehot  # (nwin, S)
    passed = jnp.all(sums >= thresholds, axis=-1)
    return passed, sums[:, -1]


def _prepare_tables(c: BbfCascade, W0: int, W1: int, W2: int):
    F = len(c.stage_of)

    def offs(xs, ys, zs, level, width):
        mask = (zs == level) & (xs >= 0)
        off = np.where(mask, ys * width + xs, 0).astype(np.int32)
        return off, mask

    tabs = []
    for level, width in ((0, W0), (1, W1), (2, W2)):
        po, pm = offs(c.px, c.py, c.pz, level, width)
        no, nm = offs(c.nx, c.ny, c.nz, level, width)
        off = np.concatenate([po, no], axis=1)          # (F, 16)
        mask = np.concatenate([pm, nm], axis=1)
        pos = np.concatenate([np.ones_like(pm), np.zeros_like(nm)], axis=1).astype(bool)
        tabs.append((off, mask, pos))
    off0, mask0, pos0 = tabs[0]
    off1, mask1, pos1 = tabs[1]
    off2, mask2, pos2 = tabs[2]
    S = c.n_stages
    onehot = np.zeros((F, S), np.float32)
    onehot[np.arange(F), c.stage_of] = 1.0
    return (tuple(jnp.asarray(t) for t in
                  (off0, off1, off2, mask0, mask1, mask2, pos0, pos1, pos2)),
            jnp.asarray(onehot))


def detect_objects(a, cascades, params: Optional[BbfParams] = None) -> List[Comp]:
    """ccv_bbf_detect_objects twin (ccv_bbf.c:1188)."""
    from ccv_tpu.core.dense_matrix import as_array
    from ccv_tpu.core.io import rgb_to_gray_u8

    params = params or BbfParams()
    if not isinstance(cascades, (list, tuple)):
        cascades = [cascades]
    img = as_array(a)
    if img.ndim == 3 and img.shape[-1] == 3:
        img = jnp.asarray(rgb_to_gray_u8(np.asarray(img)))
    elif img.ndim == 3:
        img = img[..., 0]
    H, W = img.shape
    pw, ph = params.size
    hr = H // ph
    wr = W // pw
    scale = 2.0 ** (1.0 / (params.interval + 1.0))
    next_ = params.interval + 1
    scale_upto = int(math.log(min(hr, wr)) / math.log(scale))
    c0 = cascades[0]
    # pyramid: indices 0..scale_upto+2*next-1; [i] for i<next resampled,
    # beyond: sample_down of [i-next]; accurate mode adds 3 offset variants
    pyr = {}
    if (ph, pw) != (c0.height, c0.width):
        pyr[(0, 0)] = resample.resample(
            img, rows=H * c0.height // ph, cols=W * c0.width // pw,
            rows_scale=(H * c0.height // ph) / H,
            cols_scale=(W * c0.width // pw) / W, interp=resample.INTER_AREA)
    else:
        pyr[(0, 0)] = img
    for i in range(1, min(params.interval + 1, scale_upto + next_ * 2)):
        base = pyr[(0, 0)]
        r = int(base.shape[0] / scale ** i)
        cl = int(base.shape[1] / scale ** i)
        pyr[(i, 0)] = resample.resample(
            base, rows=r, cols=cl, rows_scale=r / base.shape[0],
            cols_scale=cl / base.shape[1], interp=resample.INTER_AREA)
    for i in range(next_, scale_upto + next_ * 2):
        pyr[(i, 0)] = resample.sample_down(pyr[(i - next_, 0)])
    if params.accurate:
        for i in range(next_ * 2, scale_upto + next_ * 2):
            pyr[(i, 1)] = resample.sample_down(pyr[(i - next_, 0)], src_x=1)
            pyr[(i, 2)] = resample.sample_down(pyr[(i - next_, 0)], src_y=1)
            pyr[(i, 3)] = resample.sample_down(pyr[(i - next_, 0)], src_x=1, src_y=1)

    result: List[Comp] = []
    for t, casc in enumerate(cascades):
        tables_cache = {}
        scale_x = pw / casc.width
        scale_y = ph / casc.height
        comps: List[Comp] = []
        for i in range(scale_upto):
            full = pyr[(i, 0)]
            half = pyr[(i + next_, 0)]
            dxs = [0, 1, 0, 1]
            dys = [0, 0, 1, 1]
            for q in range(4 if params.accurate else 1):
                quarter = pyr[(i + 2 * next_, q)]
                i_rows = quarter.shape[0] - (casc.height >> 2)
                i_cols = quarter.shape[1] - (casc.width >> 2)
                if i_rows <= 0 or i_cols <= 0:
                    continue
                key = (full.shape[1], half.shape[1], quarter.shape[1])
                if key not in tables_cache:
                    tables_cache[key] = _prepare_tables(casc, *key)
                tables, onehot = tables_cache[key]
                # accurate offsets shift full by 2px and half by 1px
                f = full[dys[q] * 2:, dxs[q] * 2:] if q else full
                h2 = half[dys[q]:, dxs[q]:] if q else half
                # re-pad to original widths so linear offsets stay valid
                if q:
                    f = jnp.pad(f, ((0, dys[q] * 2), (0, dxs[q] * 2)))
                    h2 = jnp.pad(h2, ((0, dys[q]), (0, dxs[q])))
                passed, conf = _eval_scale(
                    f, h2, quarter, tables,
                    jnp.asarray(casc.thresholds), jnp.asarray(casc.alphas),
                    onehot, ny_=i_rows, nx_=i_cols, shapes=key)
                passed = np.asarray(passed)
                conf = np.asarray(conf)
                for widx in np.nonzero(passed)[0]:
                    wy, wx = divmod(int(widx), i_cols)
                    comps.append(Comp(
                        x=int((wx * 4 + dxs[q] * 2) * scale_x + 0.5),
                        y=int((wy * 4 + dys[q] * 2) * scale_y + 0.5),
                        width=int(casc.width * scale_x + 0.5),
                        height=int(casc.height * scale_y + 0.5),
                        confidence=float(conf[widx]),
                        classification_id=t))
            scale_x *= scale
            scale_y *= scale
        # grouping: average box per group (ccv_bbf.c:1296-1330)
        if params.min_neighbors == 0:
            result += comps
            continue
        if not comps:
            continue

        def same(r1, r2):
            d = int(r1.width * 0.25 + 0.5)
            return (r2.classification_id == r1.classification_id
                    and r1.x - d <= r2.x <= r1.x + d
                    and r1.y - d <= r2.y <= r1.y + d
                    and r2.width <= int(r1.width * 1.5 + 0.5)
                    and int(r2.width * 1.5 + 0.5) >= r1.width)

        idx = group(comps, same)
        ng = max(idx) + 1
        sums = [[0, 0, 0, 0, 0, 0.0] for _ in range(ng)]  # x,y,w,h,n,conf
        for cm, g in zip(comps, idx):
            s_ = sums[g]
            s_[0] += cm.x
            s_[1] += cm.y
            s_[2] += cm.width
            s_[3] += cm.height
            s_[4] += 1
            s_[5] = max(s_[5], cm.confidence)
        seq2 = []
        for s_ in sums:
            n = s_[4]
            if n >= params.min_neighbors:
                seq2.append(Comp(
                    x=(s_[0] * 2 + n) // (2 * n), y=(s_[1] * 2 + n) // (2 * n),
                    width=(s_[2] * 2 + n) // (2 * n),
                    height=(s_[3] * 2 + n) // (2 * n),
                    confidence=s_[5], neighbors=n, classification_id=t))
        # filter small-inside-large (ccv_bbf.c:1333-1358)
        for i1, r1 in enumerate(seq2):
            flag = True
            for j1, r2 in enumerate(seq2):
                d = int(r2.width * 0.25 + 0.5)
                if (i1 != j1 and r1.classification_id == r2.classification_id
                        and r1.x >= r2.x - d and r1.y >= r2.y - d
                        and r1.x + r1.width <= r2.x + r2.width + d
                        and r1.y + r1.height <= r2.y + r2.height + d
                        and (r2.neighbors > max(3, r1.neighbors) or r1.neighbors < 3)):
                    flag = False
                    break
            if flag:
                result.append(r1)
    return result
