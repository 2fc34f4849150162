"""ICF cascade training (icfcreate twin) end-to-end on a synthetic task."""

import numpy as np
import pytest


def _patches(n, size, rng, positive):
    """Positives: bright vertical bar (pedestrian-ish); negatives: noise."""
    W, H = size
    out = np.zeros((n, H, W, 3), np.uint8)
    for i in range(n):
        img = rng.normal(60, 15, (H, W, 3))
        if positive:
            cx = W // 2 + rng.integers(-2, 3)
            w = max(3, W // 4) + rng.integers(-1, 2)
            img[H // 6: H - H // 6, cx - w // 2: cx + w // 2] += 110
        out[i] = np.clip(img, 0, 255).astype(np.uint8)
    return out


@pytest.fixture(scope="module")
def trained():
    from ccv_tpu.train import icf as train_icf

    rng = np.random.default_rng(0)
    size = (16, 32)
    params = train_icf.IcfTrainParams(size=size, feature_size=400,
                                      weak_classifier=12, seed=1)
    pos = _patches(100, size, rng, True)
    neg = _patches(240, size, rng, False)
    cascade = train_icf.train_cascade(pos, neg, params)
    return cascade, params


def test_icf_train_separates_heldout(trained):
    from ccv_tpu.train import icf as train_icf

    cascade, params = trained
    rng = np.random.default_rng(42)
    pos = _patches(40, params.size, rng, True)
    neg = _patches(40, params.size, rng, False)
    # score patches through the packed cascade arrays
    feats = dict(count=(cascade.alpha[:, 0] != 0).sum(-1).clip(1, 2),
                 channel=cascade.channel[:, 0], alpha=cascade.alpha[:, 0],
                 sat0=cascade.sat0[:, 0], sat1=cascade.sat1[:, 0])
    v_root = train_icf.precompute_feature_values(
        np.concatenate([pos, neg]), feats) + cascade.beta[None, :, 0]
    # depth-1 approximation of the vote for a sanity margin check
    votes = np.where(v_root > 0, cascade.weigh[:, 1], cascade.weigh[:, 0])
    score = votes.sum(-1)
    assert score[:40].mean() > score[40:].mean() + 1.0


def test_icf_written_cascade_loads_and_detects(trained, tmp_path):
    from ccv_tpu.detectors import icf
    from ccv_tpu.train import icf as train_icf

    cascade, params = trained
    p = str(tmp_path / "bar.icf")
    train_icf.write_cascade(cascade, p)
    loaded = icf.load_cascade(p)
    assert loaded.n_weak == cascade.n_weak
    np.testing.assert_allclose(loaded.weigh, cascade.weigh, rtol=1e-6)
    np.testing.assert_array_equal(loaded.sat0, cascade.sat0)
    # composite scene with one planted bar
    rng = np.random.default_rng(9)
    scene = np.clip(rng.normal(60, 15, (96, 96, 3)), 0, 255).astype(np.uint8)
    scene[20:52, 40:56] = _patches(1, params.size,
                                   np.random.default_rng(3), True)[0]
    out = icf.detect_objects(scene, loaded,
                             icf.IcfParams(min_neighbors=0, interval=1))
    assert out, "trained ICF cascade found nothing"

    def iou(c):
        ix = max(0, min(c.x + c.width, 56) - max(c.x, 40))
        iy = max(0, min(c.y + c.height, 52) - max(c.y, 20))
        inter = ix * iy
        return inter / (c.width * c.height + 16 * 32 - inter)

    # the planted bar is vertically self-similar, so several shifted
    # windows tie at max confidence; gate on overlap instead of position
    assert max(iou(c) for c in out) > 0.5, [(c.x, c.y) for c in out[:5]]


def test_icf_multiscale_roundtrip_and_detect(trained, tmp_path):
    """Type-B multiscale cascade: write/read the directory format and
    detect through the per-scale path."""
    from ccv_tpu.detectors import icf
    from ccv_tpu.train import icf as train_icf

    cascade, params = trained
    # second scale: train at 1.25x the size on rescaled patches
    import jax.numpy as jnp

    from ccv_tpu.ops import resample

    rng = np.random.default_rng(1)
    size2 = (20, 40)
    pos2 = _patches(80, size2, rng, True)
    neg2 = _patches(160, size2, rng, False)
    cas2 = train_icf.train_cascade(
        pos2, neg2, train_icf.IcfTrainParams(size=size2, feature_size=300,
                                             weak_classifier=10, seed=5))
    ms = icf.IcfMultiscaleCascade(octave=1, grayscale=0,
                                  cascades=[cascade, cas2])
    d = str(tmp_path / "msdir")
    icf.write_multiscale_cascade(ms, d)
    ms2 = icf.load_multiscale_cascade(d)
    assert ms2.count == 2 and ms2.octave == 1
    np.testing.assert_allclose(ms2.cascades[0].weigh, cascade.weigh,
                               rtol=1e-6)
    scene = np.clip(np.random.default_rng(9).normal(60, 15, (96, 96, 3)),
                    0, 255).astype(np.uint8)
    scene[20:52, 40:56] = _patches(1, params.size,
                                   np.random.default_rng(3), True)[0]
    out = icf.detect_multiscale(scene, ms2,
                                icf.IcfParams(min_neighbors=0, interval=1))
    assert out

    def iou(c):
        ix = max(0, min(c.x + c.width, 56) - max(c.x, 40))
        iy = max(0, min(c.y + c.height, 52) - max(c.y, 20))
        inter = ix * iy
        return inter / (c.width * c.height + 16 * 32 - inter)

    assert max(iou(c) for c in out) > 0.5
