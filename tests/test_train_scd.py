"""SCD cascade training (scdcreate twin) end-to-end on a synthetic task."""

import numpy as np
import pytest


def _make_patches(n, size, rng, positive):
    """Positives: bright cross on dark; negatives: noise/gradients."""
    W, H = size
    out = np.zeros((n, H, W, 3), np.uint8)
    for i in range(n):
        base = rng.integers(20, 60)
        img = rng.normal(base, 12, (H, W, 3))
        if positive:
            cx = W // 2 + rng.integers(-2, 3)
            cy = H // 2 + rng.integers(-2, 3)
            t = max(2, W // 8) + rng.integers(-1, 2)
            img[cy - t:cy + t, :, :] += 140
            img[:, cx - t:cx + t, :] += 140
        else:
            if rng.random() < 0.5:  # gradient distractor
                img += np.linspace(0, 80, W)[None, :, None]
        out[i] = np.clip(img, 0, 255).astype(np.uint8)
    return out


@pytest.fixture(scope="module")
def trained():
    from ccv_tpu.train import scd as train_scd

    rng = np.random.default_rng(0)
    size = (24, 24)
    params = train_scd.ScdTrainParams(
        size=size, boosting=2, maximum_feature=6, prune_stage=1,
        prune_feature=4, train_steps=90, hit_rate=0.98,
        accu_false_positive_rate=1e-6)
    pos = _make_patches(64, size, rng, True)
    neg = _make_patches(150, size, rng, False)
    cascade = train_scd.train_cascade(pos, neg, params)
    return cascade, params, rng


def test_trained_cascade_separates_heldout(trained):
    from ccv_tpu.train import scd as train_scd

    cascade, params, _ = trained
    rng = np.random.default_rng(99)
    pos = _make_patches(40, params.size, rng, True)
    neg = _make_patches(40, params.size, rng, False)
    feats = np.stack([np.stack([cascade.sx, cascade.sy, cascade.dx,
                                cascade.dy], axis=-1)])[0]
    fv = np.asarray(train_scd.precompute_feature_vectors(
        np.concatenate([pos, neg]), feats))
    logit = np.einsum("nfk,fk->nf", fv, cascade.w) + cascade.bias
    h = np.tanh(0.5 * logit)
    onehot = np.zeros((cascade.n_features, cascade.n_stages), np.float32)
    onehot[np.arange(cascade.n_features), cascade.stage_of] = 1
    v = h @ onehot
    passed = (v > cascade.thresholds).all(axis=1)
    tpr = passed[:40].mean()
    fpr = passed[40:].mean()
    assert tpr > 0.9, tpr
    assert fpr < 0.2, fpr


def test_written_cascade_loads_and_detects(trained, tmp_path):
    from ccv_tpu.detectors import scd
    from ccv_tpu.train import scd as train_scd

    cascade, params, _ = trained
    p = str(tmp_path / "cross.sqlite3")
    train_scd.write_cascade(cascade, p)
    loaded = scd.load_cascade(p)
    assert loaded.n_features == cascade.n_features
    np.testing.assert_array_equal(loaded.sx, cascade.sx)
    np.testing.assert_allclose(loaded.w, cascade.w, rtol=1e-6)
    # composite scene: one cross at a known place
    rng = np.random.default_rng(7)
    scene = np.clip(rng.normal(40, 12, (96, 128, 3)), 0, 255).astype(np.uint8)
    patch = _make_patches(1, params.size, np.random.default_rng(5), True)[0]
    scene[30:54, 60:84] = patch
    out = scd.detect(scene, loaded,
                     scd.ScdParams(min_neighbors=1, interval=1,
                                   size=params.size))
    assert out, "trained cascade found nothing"
    best = max(out, key=lambda c: c.confidence)
    assert abs(best.x - 60) < 10 and abs(best.y - 30) < 10, (best.x, best.y)
