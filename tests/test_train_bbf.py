"""BBF cascade training (bbfcreate twin) on a synthetic task."""

import numpy as np
import pytest


def _patches(n, rng, positive):
    """Positives: dark 'eyes' band over bright background (face-ish
    brightness structure); negatives: noise."""
    out = np.zeros((n, 24, 24), np.uint8)
    for i in range(n):
        img = rng.normal(140, 18, (24, 24))
        if positive:
            r = rng.integers(-1, 2)
            img[7 + r:11 + r, 3:10] -= 90   # left eye
            img[7 + r:11 + r, 14:21] -= 90  # right eye
            img[15 + r:19 + r, 8:16] -= 50  # mouth
        out[i] = np.clip(img, 0, 255).astype(np.uint8)
    return out


@pytest.fixture(scope="module")
def trained():
    from ccv_tpu.train import bbf as train_bbf

    rng = np.random.default_rng(0)
    pos = _patches(120, rng, True)
    neg = _patches(300, rng, False)
    params = train_bbf.BbfTrainParams(population=128, generations=3,
                                      max_features_per_stage=8, n_stages=3,
                                      seed=2)
    return train_bbf.train_cascade(pos, neg, params), params


def test_bbf_train_separates(trained):
    from ccv_tpu.train import bbf as train_bbf

    cas, params = trained
    rng = np.random.default_rng(77)
    pos = _patches(50, rng, True)
    neg = _patches(50, rng, False)
    flat = train_bbf.flatten_pyramids(np.concatenate([pos, neg]),
                                      params.size)
    resp = train_bbf.feature_responses(flat, cas.px, cas.py, cas.pz,
                                       cas.nx, cas.ny, cas.nz, params.size)
    score = np.where(resp, cas.alphas[:, 1], cas.alphas[:, 0]).sum(-1)
    assert score[:50].mean() > score[50:].mean() + 0.5


def test_bbf_written_cascade_loads_and_detects(trained, tmp_path):
    from ccv_tpu.detectors import bbf
    from ccv_tpu.train import bbf as train_bbf

    cas, params = trained
    d = str(tmp_path / "face_cascade")
    train_bbf.write_cascade(cas, d)
    loaded = bbf.load_cascade(d)
    assert loaded.n_stages == cas.n_stages
    np.testing.assert_allclose(loaded.alphas, cas.alphas, rtol=1e-6)
    np.testing.assert_array_equal(loaded.px, cas.px)
    # composite scene: one planted face pattern
    rng = np.random.default_rng(5)
    scene = np.clip(rng.normal(140, 18, (72, 96)), 0, 255).astype(np.uint8)
    scene[24:48, 40:64] = _patches(1, np.random.default_rng(8), True)[0]
    out = bbf.detect_objects(scene, loaded,
                             bbf.BbfParams(min_neighbors=0, interval=1))
    assert out, "trained BBF cascade found nothing"

    def iou(c):
        ix = max(0, min(c.x + c.width, 64) - max(c.x, 40))
        iy = max(0, min(c.y + c.height, 48) - max(c.y, 24))
        inter = ix * iy
        return inter / (c.width * c.height + 24 * 24 - inter)

    assert max(iou(c) for c in out) > 0.4, [(c.x, c.y) for c in out[:5]]
