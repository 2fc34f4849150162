"""BBF cascade training — bbfcreate twin (reference: lib/ccv_bbf.c, the
genetic + gradient feature search halves of ccv_bbf_classifier_cascade_new).

A BBF feature compares min(bright points) > max(dark points) across the
3-level window pyramid (24/12/6). The reference evolves feature candidates
with a genetic algorithm (population of point sets, mutation/crossover)
scored by weighted error, then boosts them with AdaBoost into staged
classifiers.

TPU-first redesign: every candidate's response on every example computes
as one batched gather off the per-example flattened pyramid (N, D) — the
whole population is scored in a single program per generation instead of
the reference's per-feature OpenMP loops. Boosting and the soft-cascade
thresholds follow the reference; cascades serialize to the reference's
stage-file format (float bits as ints), runnable by bbfdetect.
"""

from __future__ import annotations

import dataclasses
import os
import struct
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.detectors import bbf as bbf_mod
from ccv_tpu.ops import resample

MAX_POINTS = 8


@dataclasses.dataclass
class BbfTrainParams:
    """ccv_bbf_new_param_t twin (subset)."""

    size: Tuple[int, int] = (24, 24)
    pos_crit: float = 0.995
    neg_crit: float = 0.5
    population: int = 256         # genetic population per round
    generations: int = 4
    max_features_per_stage: int = 16
    n_stages: int = 4
    seed: int = 0
    threshold_slack: float = 0.5


def _pyramid_dims(size):
    w, h = size
    return [(h, w), (h // 2, w // 2), (h // 4, w // 4)]


def flatten_pyramids(patches, size) -> np.ndarray:
    """(N, H, W) uint8 -> (N, D) concatenated 3-level pyramids (the same
    sample_down chain detect uses)."""
    x = jnp.asarray(patches)
    if x.ndim == 4:
        x = x[..., 0]
    l0 = x
    l1 = jax.vmap(lambda a: resample.sample_down(a[..., None])[..., 0])(l0)
    l2 = jax.vmap(lambda a: resample.sample_down(a[..., None])[..., 0])(l1)
    n = x.shape[0]
    flat = jnp.concatenate(
        [l0.reshape(n, -1), l1.reshape(n, -1), l2.reshape(n, -1)], axis=1)
    return np.asarray(flat).astype(np.int32)


def _point_index(px, py, pz, size):
    """Linear index of (x, y) on level z within the flattened pyramid;
    -1 points map to a sentinel slot (handled by masking)."""
    dims = _pyramid_dims(size)
    offs = [0, dims[0][0] * dims[0][1],
            dims[0][0] * dims[0][1] + dims[1][0] * dims[1][1]]
    idx = np.zeros_like(px)
    for z in range(3):
        m = pz == z
        idx[m] = offs[z] + py[m] * dims[z][1] + px[m]
    idx[pz < 0] = 0
    return idx


def feature_responses(flat: np.ndarray, px, py, pz, nx, ny, nz,
                      size) -> np.ndarray:
    """(N, F) boolean: min(bright) > max(dark) for every feature on every
    example — ONE gather per point set (_ccv_run_bbf_feature twin)."""
    pidx = _point_index(px, py, pz, size)
    nidx = _point_index(nx, ny, nz, size)
    fl = jnp.asarray(flat)
    pmask = jnp.asarray(pz >= 0)
    nmask = jnp.asarray(nz >= 0)

    @jax.jit
    def run(fl):
        bright = fl[:, pidx]   # (N, F, 8)
        dark = fl[:, nidx]
        bmin = jnp.min(jnp.where(pmask[None], bright, 10 ** 6), axis=-1)
        dmax = jnp.max(jnp.where(nmask[None], dark, -(10 ** 6)), axis=-1)
        return bmin > dmax

    return np.asarray(run(fl))


def _random_features(n, size, rng):
    """Random candidate point sets (like the reference's gene seeding)."""
    dims = _pyramid_dims(size)
    px = np.full((n, MAX_POINTS), -1, np.int32)
    py = np.zeros((n, MAX_POINTS), np.int32)
    pz = np.full((n, MAX_POINTS), -1, np.int32)
    nx = np.full((n, MAX_POINTS), -1, np.int32)
    ny = np.zeros((n, MAX_POINTS), np.int32)
    nz = np.full((n, MAX_POINTS), -1, np.int32)
    for i in range(n):
        k = int(rng.integers(1, 4))  # ccv_bbf_feature_t has ONE size for
        for arrx, arry, arrz in ((px, py, pz), (nx, ny, nz)):  # both sets
            for j in range(k):
                z = int(rng.integers(0, 3))
                arrz[i, j] = z
                arry[i, j] = int(rng.integers(0, dims[z][0]))
                arrx[i, j] = int(rng.integers(0, dims[z][1]))
    return px, py, pz, nx, ny, nz


def _mutate(feats, size, rng):
    """Point-level mutation (move / add / drop), the genetic step."""
    px, py, pz, nx, ny, nz = (a.copy() for a in feats)
    dims = _pyramid_dims(size)
    n = px.shape[0]
    for i in range(n):
        k = int((pz[i] >= 0).sum())
        op = int(rng.integers(0, 3))
        if op == 1 and k < MAX_POINTS:  # grow both sets by one point
            for arrx, arry, arrz in ((px, py, pz), (nx, ny, nz)):
                z = int(rng.integers(0, 3))
                arrz[i, k] = z
                arry[i, k] = int(rng.integers(0, dims[z][0]))
                arrx[i, k] = int(rng.integers(0, dims[z][1]))
        elif op == 2 and k > 1:  # shrink both sets
            for arrx, arry, arrz in ((px, py, pz), (nx, ny, nz)):
                arrz[i, k - 1] = -1
                arrx[i, k - 1] = -1
        else:  # move one point of each set
            j = int(rng.integers(0, k))
            for arrx, arry, arrz in ((px, py, pz), (nx, ny, nz)):
                z = int(arrz[i, j])
                arry[i, j] = int(np.clip(arry[i, j] + rng.integers(-2, 3),
                                         0, dims[z][0] - 1))
                arrx[i, j] = int(np.clip(arrx[i, j] + rng.integers(-2, 3),
                                         0, dims[z][1] - 1))
    return px, py, pz, nx, ny, nz


def train_cascade(positives, negatives,
                  params: Optional[BbfTrainParams] = None
                  ) -> bbf_mod.BbfCascade:
    """ccv_bbf_classifier_cascade_new twin on in-memory grayscale patches."""
    params = params or BbfTrainParams()
    rng = np.random.default_rng(params.seed)
    pos = np.asarray(positives)
    neg = np.asarray(negatives)
    n_pos, n_neg = len(pos), len(neg)
    flat = flatten_pyramids(np.concatenate([pos, neg]), params.size)
    y = np.concatenate([np.ones(n_pos, bool), np.zeros(n_neg, bool)])

    stage_of, thresholds, alphas = [], [], []
    F_px, F_py, F_pz, F_nx, F_ny, F_nz = [], [], [], [], [], []
    for s in range(params.n_stages):
        w = np.where(y, 0.5 / n_pos, 0.5 / max(n_neg, 1))
        rates = np.zeros(n_pos + n_neg)
        for k in range(params.max_features_per_stage):
            # genetic search for the best feature under the current weights
            feats = _random_features(params.population, params.size, rng)
            best = None
            for gen in range(params.generations):
                resp = feature_responses(flat, *feats, params.size)
                err = np.einsum("n,nf->f", w, resp != y[:, None])
                order = np.argsort(err)
                if best is None or err[order[0]] < best[0]:
                    best = (float(err[order[0]]),
                            tuple(a[order[0]].copy() for a in feats))
                # next generation: elite + mutations of the elite
                elite = tuple(a[order[: params.population // 2]]
                              for a in feats)
                mutated = _mutate(elite, params.size, rng)
                feats = tuple(np.concatenate([e, m]) for e, m in
                              zip(elite, mutated))
            err0, ft = best
            err0 = min(max(err0, 1e-6), 0.49)
            resp = feature_responses(flat, *(a[None] for a in ft),
                                     params.size)[:, 0]
            a = 0.5 * np.log((1 - err0) / err0)
            alphas.append((-a, a))
            stage_of.append(s)
            F_px.append(ft[0]); F_py.append(ft[1]); F_pz.append(ft[2])
            F_nx.append(ft[3]); F_ny.append(ft[4]); F_nz.append(ft[5])
            rates += np.where(resp, a, -a)
            correct = resp == y
            w = w * np.exp(np.where(correct, -a, a))
            w /= w.sum()
            # stop early when the stage is already clean
            thr = rates[:n_pos].min() - params.threshold_slack
            fpr = (rates[n_pos:] > thr).mean() if n_neg else 0.0
            if fpr < params.neg_crit:
                break
        thr = float(rates[:n_pos].min()) - params.threshold_slack
        thresholds.append(thr)
        # keep only negatives this stage passes (bootstrap analog)
        keep = rates[n_pos:] > thr
        if not keep.any() or s == params.n_stages - 1:
            break
        neg = neg[keep]
        flat = np.concatenate([flat[:n_pos], flat[n_pos:][keep]])
        n_neg = len(neg)
        y = np.concatenate([np.ones(n_pos, bool), np.zeros(n_neg, bool)])

    return bbf_mod.BbfCascade(
        width=params.size[0], height=params.size[1],
        stage_of=np.array(stage_of, np.int32), n_stages=len(thresholds),
        thresholds=np.array(thresholds, np.float32),
        alphas=np.array(alphas, np.float32),
        px=np.stack(F_px), py=np.stack(F_py), pz=np.stack(F_pz),
        nx=np.stack(F_nx), ny=np.stack(F_ny), nz=np.stack(F_nz))


def write_cascade(cas: bbf_mod.BbfCascade, directory: str) -> None:
    """ccv_bbf cascade writer: cascade.txt + stage-N.txt with float bits
    stored as ints (the reference's union trick)."""
    os.makedirs(directory, exist_ok=True)

    def bits(f):
        return struct.unpack("<i", struct.pack("<f", float(f)))[0]

    with open(os.path.join(directory, "cascade.txt"), "w") as f:
        f.write(f"{cas.n_stages} {cas.width} {cas.height}\n")
    for s in range(cas.n_stages):
        sel = np.nonzero(cas.stage_of == s)[0]
        with open(os.path.join(directory, f"stage-{s}.txt"), "w") as f:
            f.write(f"{len(sel)}\n")
            f.write(f"{bits(cas.thresholds[s])}\n")
            for i in sel:
                size = int((cas.pz[i] >= 0).sum())
                f.write(f"{size}\n")
                for j in range(size):
                    f.write(f"{cas.px[i, j]} {cas.py[i, j]} {cas.pz[i, j]}\n")
                    f.write(f"{cas.nx[i, j]} {cas.ny[i, j]} "
                            f"{cas.nz[i, j]}\n")
                f.write(f"{bits(cas.alphas[i, 0])} "
                        f"{bits(cas.alphas[i, 1])}\n")
