"""DPM — deformable parts model detector (reference: lib/ccv_dpm.c).

TPU-native redesign of ccv_dpm_detect_objects (ccv_dpm.c:2045):

- the HOG feature pyramid (ccv_dpm.c:45-74) reuses ``ops.classic.hog``
  (strided-conv spatial binning, no scatters);
- root/part filter responses are 31-channel correlations expressed as
  ``lax.conv_general_dilated`` -> they run on the MXU as one matmul per
  level instead of the reference's FFT tiling (which is broken upstream:
  _ccv_filter_kissfft emits garbage for multi-tile inputs);
- the generalized distance transform (GSEDT, ccv_numeric.c:1182) becomes a
  dense O(n^2) min-reduction per axis — n is a HOG grid side (<= ~200), so
  the quadratic cost is a small batched matmul-shaped reduce that
  vectorizes perfectly, instead of the reference's sequential
  lower-envelope scan;
- every pyramid level runs as one jitted program; the surviving windows
  (score > threshold) cross to the host as a score plane.

Model files are the reference's text format (ccv_dpm_read_mixture_model,
ccv_dpm.c:2279), parsed with float.fromhex.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.detectors.common import Comp, group
from ccv_tpu.ops import classic, resample

WINDOW_SIZE = 8  # CCV_DPM_WINDOW_SIZE


@dataclasses.dataclass
class DpmPartClassifier:
    x: int
    y: int
    z: int
    dx: float
    dy: float
    dxx: float
    dyy: float
    alpha: np.ndarray      # (6,)
    w: np.ndarray          # (rows, cols, 31)
    counterpart: int


@dataclasses.dataclass
class DpmRootClassifier:
    beta: float
    alpha: np.ndarray      # (3,) drift x/y/scale
    w: np.ndarray          # (rows, cols, 31)
    parts: List[DpmPartClassifier]


@dataclasses.dataclass
class DpmMixtureModel:
    roots: List[DpmRootClassifier]

    @property
    def count(self):
        return len(self.roots)


@dataclasses.dataclass
class DpmParams:
    """ccv_dpm_default_params twin (ccv_dpm.c:16)."""

    interval: int = 8
    min_neighbors: int = 1
    flags: int = 0
    threshold: float = 0.6


@dataclasses.dataclass
class RootComp:
    """ccv_root_comp_t twin: a detection plus its part placements."""

    x: int
    y: int
    width: int
    height: int
    confidence: float
    classification_id: int = 1
    neighbors: int = 1
    parts: List[Comp] = dataclasses.field(default_factory=list)


def _ffloat(tok: str) -> float:
    return float.fromhex(tok) if "x" in tok or "X" in tok else float(tok)


def read_mixture_model(path: str) -> DpmMixtureModel:
    """ccv_dpm_read_mixture_model twin (ccv_dpm.c:2279): text format with
    C99 hex floats. (The reference's pack-into-one-region copy after
    parsing has an out-of-bounds read on 64-bit; we just keep arrays.)"""
    toks = open(path).read().split()
    assert toks[0] == ".", path
    count = int(toks[1])
    pos = 2
    roots = []
    for _ in range(count):
        rows, cols = int(toks[pos]), int(toks[pos + 1])
        pos += 2
        beta = _ffloat(toks[pos])
        alpha = np.array([_ffloat(t) for t in toks[pos + 1:pos + 4]], np.float32)
        pos += 4
        n = rows * cols * 31
        w = np.array([_ffloat(t) for t in toks[pos:pos + n]],
                     np.float32).reshape(rows, cols, 31)
        pos += n
        nparts = int(toks[pos])
        pos += 1
        parts = []
        for _ in range(nparts):
            x, y, z = int(toks[pos]), int(toks[pos + 1]), int(toks[pos + 2])
            pos += 3
            dx, dy, dxx, dyy = [_ffloat(t) for t in toks[pos:pos + 4]]
            pos += 4
            palpha = np.array([_ffloat(t) for t in toks[pos:pos + 6]], np.float32)
            pos += 6
            pr, pc, cp = int(toks[pos]), int(toks[pos + 1]), int(toks[pos + 2])
            pos += 3
            n = pr * pc * 31
            pw = np.array([_ffloat(t) for t in toks[pos:pos + n]],
                          np.float32).reshape(pr, pc, 31)
            pos += n
            parts.append(DpmPartClassifier(x, y, z, dx, dy, dxx, dyy,
                                           palpha, pw, cp))
        roots.append(DpmRootClassifier(beta, alpha, w, parts))
    assert pos == len(toks), (pos, len(toks))
    return DpmMixtureModel(roots)


# ---------------------------------------------------------------------------
# device programs
# ---------------------------------------------------------------------------

def _corr31(a: jax.Array, w: np.ndarray) -> jax.Array:
    """ccv_filter + ccv_flatten twin: 31-channel correlation, zero padding,
    same-size output, window anchored at ((bh-1)//2, (bw-1)//2).
    One conv -> MXU matmul."""
    bh, bw = w.shape[0], w.shape[1]
    lhs = a[None].astype(jnp.float32)                # (1, H, W, 31)
    rhs = jnp.asarray(w, jnp.float32)[..., None]     # (bh, bw, 31, 1)
    sy, sx = (bh - 1) // 2, (bw - 1) // 2
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1),
        padding=[(sy, bh - 1 - sy), (sx, bw - 1 - sx)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[0, ..., 0]


def _gsedt_1d(f: jax.Array, d1: float, d2: float) -> Tuple[jax.Array, jax.Array]:
    """min_v d1*(j-v) + d2*(j-v)^2 + f[..., v] along the last axis.

    Returns (values, offsets j - argmin). Dense (n, n) cost instead of the
    reference's lower-envelope scan (ccv_numeric.c:1182) — branch-free.
    """
    n = f.shape[-1]
    j = jnp.arange(n, dtype=jnp.float32)
    d = j[:, None] - j[None, :]                      # (j, v) displacement
    cost = d1 * d + d2 * d * d + f[..., None, :]     # (..., j, v)
    idx = jnp.argmin(cost, axis=-1)
    val = jnp.take_along_axis(cost, idx[..., None], axis=-1)[..., 0]
    return val, (jnp.arange(n, dtype=jnp.int32) - idx.astype(jnp.int32))


def _gsedt(f, dx, dy, dxx, dyy):
    """ccv_distance_transform(CCV_NEGATIVE | CCV_GSEDT) twin: x pass then
    y pass on -f; returns (values, x_offsets, y_offsets) where offsets
    follow the reference's convention (x offsets from the x pass at the
    query row, y offsets from the y pass)."""
    v1, rx = _gsedt_1d(-f, dx, dxx)
    v2, ry = _gsedt_1d(jnp.swapaxes(v1, -1, -2), dy, dyy)
    return jnp.swapaxes(v2, -1, -2), rx, jnp.swapaxes(ry, -1, -2)


# jitted per-(root, level-shape) programs; the root's filters and
# deformation coefficients are closed-over constants
_LEVEL_CACHE: dict = {}


def _get_level_fn(root: DpmRootClassifier, hog_shape, hog2x_shape):
    key = (id(root), hog_shape, hog2x_shape)
    fn = _LEVEL_CACHE.get(key)
    if fn is not None:
        return fn
    rr, rc = root.w.shape[0], root.w.shape[1]
    rwh, rww = (rr - 1) // 2, (rc - 1) // 2

    def level(hog, hog2x):
        """Score one pyramid level for one root classifier.

        Returns (root_score (H, W), part_feature/dxm/dym stacked per part).
        Mirrors _ccv_dpm_compute_score (ccv_dpm.c:76-118).
        """
        root_feature = _corr31(hog, root.w)
        H, W = root_feature.shape
        y_grid = jnp.arange(H)[:, None]
        x_grid = jnp.arange(W)[None, :]
        pf_list, dxm_list, dym_list = [], [], []
        for part in root.parts:
            feature = _corr31(hog2x, part.w)
            pf, dxm, dym = _gsedt(feature, part.dx, part.dy,
                                  part.dxx, part.dyy)
            ph, pw_ = part.w.shape[0], part.w.shape[1]
            pwh, pww = (ph - 1) // 2, (pw_ - 1) // 2
            offy = part.y + pwh - rwh * 2
            offx = part.x + pww - rww * 2
            iy = jnp.clip(y_grid * 2 + offy, pwh, pf.shape[0] - ph + pwh)
            ix = jnp.clip(x_grid * 2 + offx, pww, pf.shape[1] - pw_ + pww)
            root_feature = root_feature - pf[iy, ix]
            pf_list.append(pf)
            dxm_list.append(dxm)
            dym_list.append(dym)
        return (root_feature, jnp.stack(pf_list), jnp.stack(dxm_list),
                jnp.stack(dym_list))

    fn = jax.jit(level)
    _LEVEL_CACHE[key] = fn
    return fn


# ---------------------------------------------------------------------------
# pyramid + detect
# ---------------------------------------------------------------------------

def _feature_pyramid(a: jax.Array, scale_upto: int, interval: int):
    """_ccv_dpm_feature_pyramid twin (ccv_dpm.c:45): image pyramid then HOG;
    the first `next` levels are 2x-resolution HOG (size 4)."""
    next_ = interval + 1
    scale = 2.0 ** (1.0 / next_)
    n = scale_upto + next_ * 2
    imgs: List[Optional[jax.Array]] = [None] * n
    imgs[next_] = a
    for i in range(1, interval + 1):
        rows = int(a.shape[0] / scale ** i)
        cols = int(a.shape[1] / scale ** i)
        imgs[next_ + i] = resample.resample(
            a, rows=rows, cols=cols, rows_scale=rows / a.shape[0],
            cols_scale=cols / a.shape[1], interp=resample.INTER_AREA)
    for i in range(next_, scale_upto + next_):
        imgs[i + next_] = resample.sample_down(imgs[i])
    pyr: List[jax.Array] = [None] * n
    for i in range(next_):
        pyr[i] = classic.hog(imgs[i + next_], sbin=9, size=WINDOW_SIZE // 2)
    for i in range(next_, n):
        pyr[i] = classic.hog(imgs[i], sbin=9, size=WINDOW_SIZE)
    return pyr


def _scale_upto(H, W, models: Sequence[DpmMixtureModel], interval: int):
    size_w, size_h = W, H
    for model in models:
        for root in model.roots:
            size_w = min(root.w.shape[1] * WINDOW_SIZE, size_w)
            size_h = min(root.w.shape[0] * WINDOW_SIZE, size_h)
    hr = H // size_h
    wr = W // size_w
    scale = 2.0 ** (1.0 / (interval + 1))
    next_ = interval + 1
    if min(hr, wr) < 1:
        return -1
    return int(math.log(min(hr, wr)) / math.log(scale)) - next_


def detect(img, models, params: Optional[DpmParams] = None) -> List[RootComp]:
    """ccv_dpm_detect_objects twin (ccv_dpm.c:2045)."""
    from ccv_tpu.core.dense_matrix import as_array

    if isinstance(models, DpmMixtureModel):
        models = [models]
    params = params or DpmParams()
    a = as_array(img)
    if a.ndim == 2:
        a = a[..., None]
    H, W = int(a.shape[0]), int(a.shape[1])
    scale = 2.0 ** (1.0 / (params.interval + 1))
    next_ = params.interval + 1
    scale_upto = _scale_upto(H, W, models, params.interval)
    if scale_upto < 0:
        return []
    pyr = _feature_pyramid(jnp.asarray(a), scale_upto, params.interval)
    result: List[RootComp] = []
    for c, model in enumerate(models):
        seq: List[RootComp] = []
        scale_x = scale_y = 1.0
        for i in range(next_, scale_upto + next_ * 2):
            for root in model.roots:
                fn = _get_level_fn(root, tuple(pyr[i].shape),
                                   tuple(pyr[i - next_].shape))
                score, pf, dxm, dym = fn(pyr[i], pyr[i - next_])
                rr, rc = root.w.shape[0], root.w.shape[1]
                rwh, rww = (rr - 1) // 2, (rc - 1) // 2
                rwh_1, rww_1 = rr // 2, rc // 2
                score_h = np.asarray(score)
                ys, xs = np.nonzero(
                    score_h + root.beta > params.threshold)
                sel = ((ys >= rwh) & (ys < score_h.shape[0] - rwh_1)
                       & (xs >= rww) & (xs < score_h.shape[1] - rww_1))
                ys, xs = ys[sel], xs[sel]
                if len(ys):
                    # the part planes are large; fetch them only for the
                    # (rare) levels where a window passes the threshold
                    pf_h = np.asarray(pf)
                    dx_h = np.asarray(dxm)
                    dy_h = np.asarray(dym)
                    for y, x in zip(ys.tolist(), xs.tolist()):
                        conf = float(score_h[y, x]) + root.beta
                        drift_x, drift_y, drift_scale = (
                            float(root.alpha[0]), float(root.alpha[1]),
                            float(root.alpha[2]))
                        parts = []
                        for k, part in enumerate(root.parts):
                            ph, pw_ = part.w.shape[0], part.w.shape[1]
                            pwh, pww = (ph - 1) // 2, (pw_ - 1) // 2
                            offy = part.y + pwh - rwh * 2
                            offx = part.x + pww - rww * 2
                            iy = int(np.clip(y * 2 + offy, pwh,
                                             pf_h.shape[1] - ph + pwh))
                            ix = int(np.clip(x * 2 + offx, pww,
                                             pf_h.shape[2] - pw_ + pww))
                            ry = int(dy_h[k, iy, ix])
                            rx = int(dx_h[k, iy, ix])
                            drift_x += part.alpha[0] * rx + part.alpha[1] * ry
                            drift_y += part.alpha[2] * rx + part.alpha[3] * ry
                            drift_scale += part.alpha[4] * rx + part.alpha[5] * ry
                            sy_, sx_ = iy - ry, ix - rx
                            parts.append(Comp(
                                x=int((sx_ - pww) * WINDOW_SIZE / 2 * scale_x + 0.5),
                                y=int((sy_ - pwh) * WINDOW_SIZE / 2 * scale_y + 0.5),
                                width=int(pw_ * WINDOW_SIZE / 2 * scale_x + 0.5),
                                height=int(ph * WINDOW_SIZE / 2 * scale_y + 0.5),
                                confidence=-float(pf_h[k, iy, ix]),
                                classification_id=c))
                        seq.append(RootComp(
                            x=int((x + drift_x) * WINDOW_SIZE * scale_x
                                  - rww * WINDOW_SIZE * scale_x
                                  * (1.0 + drift_scale) + 0.5),
                            y=int((y + drift_y) * WINDOW_SIZE * scale_y
                                  - rwh * WINDOW_SIZE * scale_y
                                  * (1.0 + drift_scale) + 0.5),
                            width=int(rc * WINDOW_SIZE * scale_x
                                      * (1.0 + drift_scale) + 0.5),
                            height=int(rr * WINDOW_SIZE * scale_y
                                       * (1.0 + drift_scale) + 0.5),
                            confidence=conf,
                            classification_id=c + 1,
                            parts=parts))
            scale_x *= scale
            scale_y *= scale
        result.extend(_dpm_group(seq, params.min_neighbors))
    return result


def _same_class(r1: RootComp, r2: RootComp) -> bool:
    """_ccv_is_equal_same_class twin (ccv_dpm.c:2028)."""
    distance = int(min(r1.width, r1.height) * 0.25 + 0.5)
    return (r2.classification_id == r1.classification_id
            and r2.x <= r1.x + distance and r2.x >= r1.x - distance
            and r2.y <= r1.y + distance and r2.y >= r1.y - distance
            and r2.width <= int(r1.width * 1.5 + 0.5)
            and int(r2.width * 1.5 + 0.5) >= r1.width
            and r2.height <= int(r1.height * 1.5 + 0.5)
            and int(r2.height * 1.5 + 0.5) >= r1.height)


def _dpm_group(seq: List[RootComp], min_neighbors: int) -> List[RootComp]:
    """The grouping + nested-rectangle filters of ccv_dpm_detect_objects
    (ccv_dpm.c:2195-2276)."""
    if min_neighbors == 0:
        return list(seq)
    if not seq:
        return []
    idx = group(seq, lambda a, b: _same_class(a, b) or _same_class(b, a))
    ngroups = max(idx) + 1
    best: List[Optional[RootComp]] = [None] * ngroups
    counts = [0] * ngroups
    for r, g in zip(seq, idx):
        counts[g] += 1
        if best[g] is None or r.confidence > best[g].confidence:
            best[g] = r
    seq2 = []
    for g in range(ngroups):
        if counts[g] >= min_neighbors:
            r = dataclasses.replace(best[g])
            r.neighbors = counts[g]
            seq2.append(r)
    # mute large rects that contain a better smaller rect
    muted = [False] * len(seq2)
    for i, r2 in enumerate(seq2):
        distance = int(min(r2.width, r2.height) * 0.25 + 0.5)
        for j, r1 in enumerate(seq2):
            if (i != j and r1.classification_id == r2.classification_id
                    and r1.x >= r2.x - distance and r1.y >= r2.y - distance
                    and r1.x + r1.width <= r2.x + r2.width + distance
                    and r1.y + r1.height <= r2.y + r2.height + distance
                    and r2.confidence <= r1.confidence
                    and r2.neighbors < r1.neighbors):
                muted[i] = True
                break
    out = []
    for i, r1 in enumerate(seq2):
        if muted[i]:
            continue
        flag = True
        for j, r2 in enumerate(seq2):
            distance = int(min(r2.width, r2.height) * 0.25 + 0.5)
            if (i != j and r1.classification_id == r2.classification_id
                    and r1.x >= r2.x - distance and r1.y >= r2.y - distance
                    and r1.x + r1.width <= r2.x + r2.width + distance
                    and r1.y + r1.height <= r2.y + r2.height + distance
                    and (r2.confidence > r1.confidence
                         or r2.neighbors >= r1.neighbors)):
                flag = False
                break
        if flag:
            out.append(r1)
    return out
