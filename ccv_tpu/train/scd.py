"""SCD cascade training — scdcreate twin (reference: lib/ccv_scd.c:1259
ccv_scd_classifier_cascade_new, gentle AdaBoost over SURF-box stumps).

TPU-first redesign of the trainer:
- candidate features are the reference's dense 4x1/1x4/2x2 box grids
  (_ccv_scd_stump_features, ccv_scd.c:608);
- feature vectors for every (example x feature) precompute as one batched
  program (vmapped SURF map -> SAT -> corner indexing -> L2Hys), replacing
  the OpenMP parallel_for per example;
- the per-feature logistic stump training (the reference runs conjugate
  gradient per feature under parallel_for, ccv_scd.c:825) trains ALL
  features simultaneously: one (N, F, 32) einsum per Adam step on the
  weighted gentle-AdaBoost loss (1 +- tanh(f/2))^2 + C*|w|_1;
- stage logic (weight updates, threshold at hit rate, AUC early stop,
  hard negative mining) follows the reference exactly.

The trained cascade serializes to the reference's SQLite schema, so both
our scd.detect and the reference's scddetect can run it.
"""

from __future__ import annotations

import dataclasses
import sqlite3
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.core import algebra
from ccv_tpu.detectors import scd as scd_mod

_THETA = scd_mod._THETA


@dataclasses.dataclass
class ScdTrainParams:
    """ccv_scd_train_param_t twin (subset; stop criteria flattened)."""

    size: Tuple[int, int] = (40, 40)        # (width, height)
    feature_base: Tuple[int, int] = (8, 8)
    feature_range_through: int = 4
    feature_step_through: int = 4
    boosting: int = 4                        # max stages
    hit_rate: float = 0.995
    false_positive_rate: float = 0.5
    accu_false_positive_rate: float = 1e-3
    auc_crit: float = 1e-5
    maximum_feature: int = 16
    prune_stage: int = 3
    prune_feature: int = 4
    C: float = 0.002
    train_steps: int = 200                   # Adam steps per boosting round
    learning_rate: float = 0.05
    seed: int = 0


def stump_features(params: ScdTrainParams) -> np.ndarray:
    """_ccv_scd_stump_features twin: (F, 4boxes, 4) int array of
    (sx, sy, dx, dy) per box."""
    W, H = params.size
    base_w, base_h = params.feature_base
    rt, st = params.feature_range_through, params.feature_step_through
    out = []
    for w in range(base_w, W + 1, rt):
        if w % 4 == 0:  # 4x1
            h = w // 4
            for x in range(0, W - w + 1, st):
                for y in range(0, H - h + 1, st):
                    q = w // 4
                    out.append([(x + i * q, y, x + (i + 1) * q, y + h)
                                for i in range(4)])
    for h in range(base_h, H + 1, rt):
        if h % 4 == 0:  # 1x4
            w = h // 4
            for x in range(0, W - w + 1, st):
                for y in range(0, H - h + 1, st):
                    q = h // 4
                    out.append([(x, y + i * q, x + w, y + (i + 1) * q)
                                for i in range(4)])
    for w in range(base_w, W + 1, rt):
        for h in range(base_h, H + 1, rt):
            if w % 2 or h % 2:
                continue
            if not (w == h or w == h * 2 or w * 2 == h or w * 2 == h * 3
                    or w * 3 == h * 2):
                continue
            for x in range(0, W - w + 1, st):
                for y in range(0, H - h + 1, st):
                    hw, hh = w // 2, h // 2
                    out.append([(x, y, x + hw, y + hh),
                                (x, y + hh, x + hw, y + h),
                                (x + hw, y, x + w, y + hh),
                                (x + hw, y + hh, x + w, y + h)])
    return np.array(out, np.int32)  # (F, 4, (sx, sy, dx, dy))


@jax.jit
def _patch_sats(patches):
    """(N, H, W, C) uint8 -> (N, H+1, W+1, 8) SATs of the SURF channels."""
    smaps = jax.vmap(scd_mod.scd_map)(patches)
    sats = jax.vmap(lambda s: algebra.sat(s, padding=algebra.PADDING_ZERO))(
        smaps)
    return sats[..., :8].astype(jnp.float32)


def precompute_feature_vectors(patches, feats: np.ndarray) -> jax.Array:
    """(N examples, F features, 32) normalized SURF vectors — the fv table
    of _ccv_scd_precompute_feature_vectors (ccv_scd.c:700)."""
    sats = _patch_sats(jnp.asarray(patches))
    sx, sy, dx, dy = (feats[..., 0], feats[..., 1], feats[..., 2],
                      feats[..., 3])

    @jax.jit
    def extract(sats):
        # 4-corner box sums via direct indexing: (N, F, 4, 8)
        box = (sats[:, dy, dx] - sats[:, sy, dx]
               - sats[:, dy, sx] + sats[:, sy, sx])
        N, F = box.shape[0], box.shape[1]
        surf = box.reshape(N, F, 32)
        inv = 1.0 / (jnp.sqrt(jnp.sum(surf * surf, -1, keepdims=True)) + 1e-6)
        surf = jnp.clip(surf * inv, -_THETA, _THETA)
        inv2 = 1.0 / (jnp.sqrt(jnp.sum(surf * surf, -1, keepdims=True)) + 1e-6)
        return surf * inv2

    return extract(sats)


def _train_all_stumps(fv, y, weights, C, steps, lr, key):
    """Train (w, bias) of EVERY feature at once on the weighted gentle-
    AdaBoost loss (ccv_scd.c:757): sum_i w_i (y_i - tanh(f/2))^2 + C|w|_1.

    fv: (N, F, 32); y: (N,) +-1; weights: (N,) summing to 1.
    Returns (W (F, 32), B (F,), werr (F,) weighted squared error)."""
    N, F, _ = fv.shape
    k1, k2 = jax.random.split(key)
    W = jax.random.uniform(k1, (F, 32), jnp.float32, -1.0, 1.0)
    B = jax.random.uniform(k2, (F,), jnp.float32, -1.0, 1.0)

    def loss_fn(params):
        W, B = params
        logit = jnp.einsum("nfk,fk->nf", fv, W,
                           preferred_element_type=jnp.float32) + B
        h = jnp.tanh(0.5 * logit)
        per_feat = jnp.sum(weights[:, None] * (y[:, None] - h) ** 2, axis=0)
        reg = C * jnp.sum(jnp.abs(W), axis=-1)
        return jnp.sum(per_feat + reg), per_feat

    @jax.jit
    def step(params, m, v, i):
        (_, per_feat), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        m = jax.tree_util.tree_map(lambda m, g: 0.9 * m + 0.1 * g, m, grads)
        v = jax.tree_util.tree_map(lambda v, g: 0.999 * v + 0.001 * g * g,
                                   v, grads)
        params = jax.tree_util.tree_map(
            lambda p, m_, v_: p - lr * m_ / (jnp.sqrt(v_) + 1e-8), params,
            m, v)
        return params, m, v, per_feat

    params = (W, B)
    m = jax.tree_util.tree_map(jnp.zeros_like, params)
    v = jax.tree_util.tree_map(jnp.zeros_like, params)
    per_feat = None
    for i in range(steps):
        params, m, v, per_feat = step(params, m, v, i)
    return params[0], params[1], per_feat


def _auc(s, n_pos):
    """_ccv_scd_auc twin."""
    pos = np.asarray(s[:n_pos])
    neg = np.asarray(s[n_pos:])
    order = np.concatenate([pos, neg])
    labels = np.concatenate([np.ones_like(pos), np.zeros_like(neg)])
    idx = np.argsort(-order, kind="stable")
    labels = labels[idx]
    tp = np.cumsum(labels)
    fp = np.cumsum(1 - labels)
    tpr = tp / max(len(pos), 1)
    fpr = fp / max(len(neg), 1)
    return float(np.trapezoid(tpr, fpr))


def _threshold_at_hit_rate(s, n_pos, hit_rate):
    """_ccv_scd_threshold_at_hit_rate twin: the largest threshold keeping
    `hit_rate` of positives; returns (threshold, tpr, fpr)."""
    pos = np.sort(np.asarray(s[:n_pos]))
    neg = np.asarray(s[n_pos:])
    k = int((1.0 - hit_rate) * n_pos)
    threshold = pos[min(k, n_pos - 1)] - 1e-6
    tpr = float((pos > threshold).mean())
    fpr = float((neg > threshold).mean()) if len(neg) else 0.0
    return threshold, tpr, fpr


def train_cascade(positives, negatives,
                  params: Optional[ScdTrainParams] = None
                  ) -> scd_mod.ScdClassifierCascade:
    """ccv_scd_classifier_cascade_new twin on in-memory patch sets.

    positives / negatives: (N, H, W, C) uint8 patches of params.size.
    Returns a ScdClassifierCascade usable by scd.detect / write_cascade.
    """
    params = params or ScdTrainParams()
    feats = stump_features(params)
    pos = np.asarray(positives)
    neg = np.asarray(negatives)
    n_pos, n_neg = len(pos), len(neg)
    fv = precompute_feature_vectors(np.concatenate([pos, neg]), feats)
    y = jnp.concatenate([jnp.ones(n_pos), -jnp.ones(n_neg)]).astype(
        jnp.float32)
    key = jax.random.PRNGKey(params.seed)

    stages: List[dict] = []
    accu_fp = 1.0
    for t in range(params.boosting):
        pw = np.full(n_pos, 0.5 / n_pos)
        nw = np.full(n_neg, 0.5 / n_neg)
        s = np.zeros(n_pos + n_neg)
        chosen: List[dict] = []
        auc_prev = 0.0
        max_feat = (params.prune_feature if t < params.prune_stage
                    else params.maximum_feature)
        for k in range(max_feat):
            key, sub = jax.random.split(key)
            weights = jnp.asarray(np.concatenate([pw, nw]), jnp.float32)
            W, B, werr = _train_all_stumps(
                fv, y, weights, params.C, params.train_steps,
                params.learning_rate, sub)
            best = int(jnp.argmin(werr))
            w_best = np.asarray(W[best])
            b_best = float(B[best])
            logit = np.asarray(fv[:, best] @ w_best) + b_best
            h = np.tanh(0.5 * logit)
            s = s + h
            auc = _auc(s, n_pos)
            chosen.append(dict(feat=feats[best], w=w_best, bias=b_best))
            _, tpr, fpr = _threshold_at_hit_rate(s, n_pos, params.hit_rate)
            if (auc - auc_prev < params.auc_crit
                    and fpr < params.false_positive_rate):
                auc_prev = auc
                break
            auc_prev = auc
            # gentle AdaBoost re-weighting (ccv_scd.c:1340-1357)
            pw = pw * np.exp(-h[:n_pos])
            nw = nw * np.exp(h[n_pos:])
            pw *= 0.5 / pw.sum()
            nw *= 0.5 / max(nw.sum(), 1e-12)
        threshold, tpr, fpr = _threshold_at_hit_rate(s, n_pos,
                                                     params.hit_rate)
        stages.append(dict(features=chosen, threshold=float(threshold)))
        accu_fp *= fpr
        # drop negatives this stage rejects (the in-memory analog of the
        # reference's hard mining: keep only surviving negatives)
        keep = np.asarray(s[n_pos:]) > threshold
        if accu_fp < params.accu_false_positive_rate or not keep.any():
            break
        neg = neg[keep]
        fv = jnp.concatenate([fv[:n_pos], fv[n_pos:][jnp.asarray(keep)]])
        n_neg = len(neg)
        y = jnp.concatenate([jnp.ones(n_pos), -jnp.ones(n_neg)]).astype(
            jnp.float32)

    # pack into the detect-side cascade struct
    sx, sy, dx, dy, bias, w, stage_of, counts, thresholds = \
        [], [], [], [], [], [], [], [], []
    for si, stage in enumerate(stages):
        counts.append(len(stage["features"]))
        thresholds.append(stage["threshold"])
        for f in stage["features"]:
            boxes = f["feat"]  # (4, (sx, sy, dx, dy))
            sx.append(boxes[:, 0])
            sy.append(boxes[:, 1])
            dx.append(boxes[:, 2])
            dy.append(boxes[:, 3])
            bias.append(f["bias"])
            w.append(f["w"])
            stage_of.append(si)
    W_, H_ = params.size
    return scd_mod.ScdClassifierCascade(
        width=W_, height=H_, margin=(0, 0, 0, 0),
        stage_counts=np.array(counts, np.int32),
        thresholds=np.array(thresholds, np.float32),
        sx=np.stack(sx).astype(np.int32), sy=np.stack(sy).astype(np.int32),
        dx=np.stack(dx).astype(np.int32), dy=np.stack(dy).astype(np.int32),
        bias=np.array(bias, np.float32), w=np.stack(w).astype(np.float32),
        stage_of=np.array(stage_of, np.int32))


def write_cascade(cascade: scd_mod.ScdClassifierCascade, path: str) -> None:
    """ccv_scd_classifier_cascade_write twin (ccv_scd.c:1451): the SQLite
    schema scd.load_cascade (and the reference's scddetect) read."""
    con = sqlite3.connect(path)
    con.executescript(
        "CREATE TABLE IF NOT EXISTS cascade_params (id INTEGER PRIMARY KEY"
        " ASC, count INTEGER, margin_left INTEGER, margin_top INTEGER,"
        " margin_right INTEGER, margin_bottom INTEGER, size_width INTEGER,"
        " size_height INTEGER);"
        "CREATE TABLE IF NOT EXISTS classifier_params (classifier INTEGER"
        " PRIMARY KEY ASC, count INTEGER, threshold REAL);"
        "CREATE TABLE IF NOT EXISTS feature_params (classifier INTEGER,"
        " id INTEGER, sx_0 INTEGER, sy_0 INTEGER, dx_0 INTEGER, dy_0"
        " INTEGER, sx_1 INTEGER, sy_1 INTEGER, dx_1 INTEGER, dy_1 INTEGER,"
        " sx_2 INTEGER, sy_2 INTEGER, dx_2 INTEGER, dy_2 INTEGER, sx_3"
        " INTEGER, sy_3 INTEGER, dx_3 INTEGER, dy_3 INTEGER, bias REAL,"
        " w BLOB, UNIQUE (classifier, id));")
    con.execute(
        "REPLACE INTO cascade_params VALUES (0, ?, ?, ?, ?, ?, ?, ?)",
        (cascade.n_stages, *cascade.margin, cascade.width, cascade.height))
    for si in range(cascade.n_stages):
        con.execute("REPLACE INTO classifier_params VALUES (?, ?, ?)",
                    (si, int(cascade.stage_counts[si]),
                     float(cascade.thresholds[si])))
    fid = {}
    for i in range(cascade.n_features):
        si = int(cascade.stage_of[i])
        j = fid.get(si, 0)
        fid[si] = j + 1
        vals = [si, j]
        for b in range(4):
            vals += [int(cascade.sx[i, b]), int(cascade.sy[i, b]),
                     int(cascade.dx[i, b]), int(cascade.dy[i, b])]
        vals += [float(cascade.bias[i]),
                 cascade.w[i].astype(np.float32).tobytes()]
        con.execute(
            "REPLACE INTO feature_params VALUES"
            " (?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?)", vals)
    con.commit()
    con.close()
