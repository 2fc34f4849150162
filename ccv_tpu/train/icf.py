"""ICF cascade training — icfcreate twin (reference: lib/ccv_icf.c
ccv_icf_classifier_cascade_new, discrete AdaBoost over depth-2 trees of
random integral-channel features).

TPU-first redesign:
- candidate features are random (channel, box, alpha) pairs exactly like
  _ccv_icf_randomize_feature (ccv_icf.c:423, count <= 2 boxes);
- feature values for every (example x feature) precompute as one batched
  program (vmapped 10-channel map -> SAT -> gathered box sums);
- the best-split search (the reference sorts every feature's values and
  scans weighted error under parallel_for, ccv_icf.c:875) is one
  vectorized argsort + cumulative-sum sweep over ALL features at once;
- depth-2 trees: root split, then per-leaf best splits on the partitioned
  weights (pass bits set when a leaf splits);
- discrete AdaBoost weights/weigh/threshold follow the reference
  (alpha = sqrt((1-r)/r), weigh = +-log(r/(1-r)), soft-cascade threshold =
  min positive cumulative rate).

The trained cascade serializes to the reference's text format, readable by
both our icf.detect_objects and the reference's icfdetect.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.core import algebra
from ccv_tpu.detectors import icf as icf_mod


@dataclasses.dataclass
class IcfTrainParams:
    """ccv_icf_new_param_t twin (subset)."""

    size: Tuple[int, int] = (30, 60)      # (width, height) of the patch
    margin: Tuple[int, int, int, int] = (0, 0, 0, 0)
    feature_size: int = 2000              # random candidate pool
    weak_classifier: int = 32             # boosting rounds
    min_dimension: int = 2
    grayscale: bool = False
    seed: int = 0
    # soft-cascade threshold slack below the min positive cumulative rate
    # (the reference leaves thresholds loose and tightens them later with
    # icfoptimize on validation data)
    threshold_slack: float = 1.0


def random_features(params: IcfTrainParams, rng: np.random.Generator):
    """_ccv_icf_randomize_feature twin, vectorized: returns dict of arrays
    (F, 2) channel/alpha and (F, 2, 2) sat0/sat1 with count (F,)."""
    F = params.feature_size
    W = params.size[0] + params.margin[0] + params.margin[2]
    H = params.size[1] + params.margin[1] + params.margin[3]
    nch = 8 if params.grayscale else 10
    md = params.min_dimension
    count = rng.integers(1, 3, F)
    channel = rng.integers(0, nch, (F, 2))
    sat0 = np.zeros((F, 2, 2), np.int32)
    sat1 = np.zeros((F, 2, 2), np.int32)
    alpha = np.zeros((F, 2), np.float32)
    for i in range(F):
        for q in range(count[i]):
            while True:
                x0, x1 = rng.integers(0, W, 2)
                y0, y1 = rng.integers(0, H, 2)
                w = abs(int(x0) - int(x1)) + 1
                h = abs(int(y0) - int(y1)) + 1
                if w * h >= (md + 1) ** 2 and w >= md and h >= md:
                    break
            sat0[i, q] = (min(x0, x1), min(y0, y1))
            sat1[i, q] = (max(x0, x1), max(y0, y1))
            alpha[i, q] = rng.random() / (w * h)
    return dict(count=count, channel=channel, alpha=alpha, sat0=sat0,
                sat1=sat1)


@jax.jit
def _patch_sats(patches):
    """(N, H, W, C) uint8 -> (N, H+1, W+1, ch) channel-map SATs."""
    # feed uint8 exactly like detect_objects does: icf_channels' gradient
    # runs the integer sobel path there, and training must see the same
    # numbers the detector will
    cmaps = jax.vmap(icf_mod.icf_channels)(patches)
    return jax.vmap(lambda c: algebra.sat(c, padding=algebra.PADDING_ZERO))(
        cmaps)


def precompute_feature_values(patches, feats) -> np.ndarray:
    """(N, F) feature values: sum over boxes of alpha * SAT box sum on the
    feature's channel (beta is learned later)."""
    sats = _patch_sats(jnp.asarray(patches))
    s0 = feats["sat0"]
    s1 = feats["sat1"]
    ch = feats["channel"]
    # SAT box sum with the +1 zero-padded convention of _ccv_icf_run_feature
    y0, x0 = s0[..., 1], s0[..., 0]
    y1, x1 = s1[..., 1] + 1, s1[..., 0] + 1

    @jax.jit
    def extract(sats):
        def boxes(sat):  # sat: (H+1, W+1, ch)
            v = (sat[y1, x1, ch] - sat[y0, x1, ch]
                 - sat[y1, x0, ch] + sat[y0, x0, ch])  # (F, 2)
            mask = (np.arange(2)[None, :] < feats["count"][:, None])
            return jnp.sum(v * feats["alpha"] * mask, axis=-1)

        return jax.vmap(boxes)(sats)

    return np.asarray(extract(sats))


def _best_split(values: np.ndarray, weights: np.ndarray, y: np.ndarray):
    """Vectorized best (feature, threshold, polarity) over ALL features.

    values: (N, F); weights: (N,) sum 1; y: (N,) bool positive.
    Returns (feature_index, threshold, polarity, err) where the decision is
    polarity * (v - threshold) > 0 meaning 'positive'.
    """
    v = jnp.asarray(values)
    w = jnp.asarray(weights)
    yy = jnp.asarray(y)
    order = jnp.argsort(v, axis=0)                     # (N, F)
    sv = jnp.take_along_axis(v, order, axis=0)
    sw = w[order]                                      # (N, F)
    sy = yy[order]
    W1 = jnp.sum(w * yy)
    W0 = jnp.sum(w * (~yy))
    # log-depth scans (jnp.cumsum is a quadratic reduce-window on TPU)
    cum1 = jax.lax.associative_scan(jnp.add, sw * sy, axis=0)
    cum0 = jax.lax.associative_scan(jnp.add, sw * (~sy), axis=0)
    # split after position j: left = indices [0..j]
    # polarity +1 (right side positive): err = cum1 + (W0 - cum0)
    # polarity -1 (left side positive):  err = cum0 + (W1 - cum1)
    err_p = cum1 + (W0 - cum0)
    err_n = cum0 + (W1 - cum1)
    # can't split between equal adjacent values
    tie = jnp.concatenate([sv[1:] == sv[:-1],
                           jnp.ones((1, v.shape[1]), bool)], axis=0)
    big = jnp.float32(2.0)
    err_p = jnp.where(tie, big, err_p)
    err_n = jnp.where(tie, big, err_n)
    err = jnp.minimum(err_p, err_n)
    flat = jnp.argmin(err)
    j, f = jnp.unravel_index(flat, err.shape)
    pol = jnp.where(err_p[j, f] <= err_n[j, f], 1.0, -1.0)
    thr = 0.5 * (sv[j, f] + sv[jnp.minimum(j + 1, v.shape[0] - 1), f])
    return int(f), float(thr), float(pol), float(err[j, f])


def train_cascade(positives, negatives,
                  params: Optional[IcfTrainParams] = None) -> icf_mod.IcfCascade:
    """ccv_icf_classifier_cascade_new twin on in-memory patch sets."""
    params = params or IcfTrainParams()
    rng = np.random.default_rng(params.seed)
    feats = random_features(params, rng)
    pos = np.asarray(positives)
    neg = np.asarray(negatives)
    n_pos, n_neg = len(pos), len(neg)
    values = precompute_feature_values(np.concatenate([pos, neg]), feats)
    y = np.concatenate([np.ones(n_pos, bool), np.zeros(n_neg, bool)])
    weights = np.where(y, 0.5 / n_pos, 0.5 / n_neg)

    def feature_of(f, thr, pol):
        cnt = int(feats["count"][f])
        return dict(count=cnt,
                    beta=float(-pol * thr),
                    channel=feats["channel"][f, :cnt].tolist(),
                    alpha=(pol * feats["alpha"][f, :cnt]).tolist(),
                    sat0=feats["sat0"][f, :cnt].tolist(),
                    sat1=feats["sat1"][f, :cnt].tolist())

    def decide(f, thr, pol, subset=None):
        v = values[:, f] if subset is None else values[subset, f]
        return pol * (v - thr) > 0

    weaks: List[dict] = []
    rates = np.zeros(n_pos + n_neg)
    for t in range(params.weak_classifier):
        f0, thr0, pol0, _ = _best_split(values, weights, y)
        root_pos = decide(f0, thr0, pol0)
        tree = dict(features=[feature_of(f0, thr0, pol0), None, None],
                    pass_bits=0)
        out = root_pos.copy()
        # leaf refinements: left (root said negative) and right (positive)
        for leaf, side in ((1, ~root_pos), (2, root_pos)):
            sub = np.nonzero(side)[0]
            wsub = weights[side]
            if len(sub) < 4 or len(np.unique(y[side])) < 2:
                continue
            wnorm = wsub / wsub.sum()
            f1, thr1, pol1, err1 = _best_split(values[side], wnorm, y[side])
            base_err = (wnorm * (y[side] != (leaf == 2))).sum()
            if err1 < base_err - 1e-9:
                tree["features"][leaf] = feature_of(f1, thr1, pol1)
                tree["pass_bits"] |= (0x2 if leaf == 1 else 0x1)
                out[sub] = decide(f1, thr1, pol1, sub)
        correct = out == y
        rate = float(weights[correct].sum())
        rate = min(max(rate, 1e-6), 1 - 1e-6)
        assert rate > 0.5, rate
        a = np.sqrt((1 - rate) / rate)
        c = np.log(rate / (1 - rate))
        tree["weigh"] = (-c, c)
        weaks.append(tree)
        weights = weights * np.where(correct, a, 1.0 / a)
        weights /= weights.sum()
        rates += np.where(out, c, -c)
        # soft cascade threshold: keep every positive on the training set,
        # with slack for held-out data (tighten with optimize_soft_cascade)
        tree["threshold"] = float(rates[:n_pos].min()) \
            - params.threshold_slack

    return _pack(weaks, params)


def _pack(weaks: List[dict], params: IcfTrainParams) -> icf_mod.IcfCascade:
    n = len(weaks)
    W = params.size[0] + params.margin[0] + params.margin[2]
    H = params.size[1] + params.margin[1] + params.margin[3]
    cas = icf_mod.IcfCascade(
        width=W, height=H, grayscale=int(params.grayscale),
        margin=tuple(params.margin), n_weak=n,
        pass_bits=np.zeros(n, np.uint32), weigh=np.zeros((n, 2), np.float32),
        thresholds=np.zeros(n, np.float32),
        channel=np.zeros((n, 3, 2), np.int32),
        alpha=np.zeros((n, 3, 2), np.float32),
        beta=np.zeros((n, 3), np.float32),
        sat0=np.zeros((n, 3, 2, 2), np.int32),
        sat1=np.zeros((n, 3, 2, 2), np.int32))
    for i, wk in enumerate(weaks):
        cas.pass_bits[i] = wk["pass_bits"]
        cas.weigh[i] = wk["weigh"]
        cas.thresholds[i] = wk["threshold"]
        for f in range(3):
            ft = wk["features"][f]
            if ft is None:
                continue
            cas.beta[i, f] = ft["beta"]
            for q in range(ft["count"]):
                cas.channel[i, f, q] = ft["channel"][q]
                cas.alpha[i, f, q] = ft["alpha"][q]
                cas.sat0[i, f, q] = ft["sat0"][q]
                cas.sat1[i, f, q] = ft["sat1"][q]
    return cas


def write_cascade(cas: icf_mod.IcfCascade, path: str) -> None:
    """ccv_icf_write_classifier_cascade twin (text, %a hex floats)."""
    with open(path, "w") as w:
        w.write(f"{cas.n_weak} {cas.width} {cas.height} {cas.grayscale}\n")
        w.write(" ".join(str(m) for m in cas.margin) + "\n")
        for i in range(cas.n_weak):
            w.write(f"{int(cas.pass_bits[i])} "
                    f"{float(cas.weigh[i, 0]).hex()} "
                    f"{float(cas.weigh[i, 1]).hex()} "
                    f"{float(cas.thresholds[i]).hex()}\n")
            for f in range(3):
                if f == 1 and not (cas.pass_bits[i] & 0x2):
                    continue
                if f == 2 and not (cas.pass_bits[i] & 0x1):
                    continue
                cnt = int((cas.alpha[i, f] != 0).sum()) or 1
                w.write(f"{cnt} {float(cas.beta[i, f]).hex()}\n")
                for q in range(cnt):
                    w.write(f"{int(cas.channel[i, f, q])} "
                            f"{float(cas.alpha[i, f, q]).hex()}\n"
                            f"{int(cas.sat0[i, f, q, 0])} "
                            f"{int(cas.sat0[i, f, q, 1])} "
                            f"{int(cas.sat1[i, f, q, 0])} "
                            f"{int(cas.sat1[i, f, q, 1])}\n")


def optimize_soft_cascade(cas: icf_mod.IcfCascade, validates,
                          min_accept: float = 0.98) -> None:
    """icfoptimize twin (bin/icfoptimize.c + ccv_icf_classifier_cascade_
    soft): tighten the per-weak thresholds so >= min_accept of validation
    positives survive every prefix."""
    vals = np.asarray(validates)
    n = len(vals)
    feats0 = dict(count=(cas.alpha[:, 0] != 0).sum(-1).clip(1, 2),
                  channel=cas.channel[:, 0], alpha=cas.alpha[:, 0],
                  sat0=cas.sat0[:, 0], sat1=cas.sat1[:, 0])
    # evaluate the full depth-2 trees on every validation patch
    def tree_vals(f):
        feats = dict(count=(cas.alpha[:, f] != 0).sum(-1).clip(1, 2),
                     channel=cas.channel[:, f], alpha=cas.alpha[:, f],
                     sat0=cas.sat0[:, f], sat1=cas.sat1[:, f])
        return precompute_feature_values(vals, feats) + cas.beta[None, :, f]

    c0, c1, c2 = tree_vals(0), tree_vals(1), tree_vals(2)
    has2 = (cas.pass_bits & 1).astype(bool)
    has1 = (cas.pass_bits & 2).astype(bool)
    pos_branch = np.where(has2[None], c2 > 0, True)
    neg_branch = np.where(has1[None], c1 > 0, False)
    r = np.where(c0 > 0, pos_branch, neg_branch)
    contrib = np.where(r, cas.weigh[None, :, 1], cas.weigh[None, :, 0])
    csum = np.cumsum(contrib, axis=1)  # (n, n_weak)
    k = max(0, int((1.0 - min_accept) * n) - 1)
    thr = np.sort(csum, axis=0)[k] - 1e-6
    cas.thresholds[:] = thr.astype(np.float32)
