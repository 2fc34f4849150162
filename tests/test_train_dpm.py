"""DPM mixture-model training (dpmcreate twin) on a synthetic task."""

import numpy as np
import pytest


def _scene(rng, obj=True, size=160, osize=48):
    """Background noise; positives get a bright H-shaped object (strong
    HOG structure, horizontally symmetric) at a random position."""
    img = rng.normal(70, 12, (size, size, 3))
    bbox = None
    if obj:
        y = int(rng.integers(4, size - osize - 4))
        x = int(rng.integers(4, size - osize - 4))
        t = max(4, osize // 7)
        img[y:y + osize, x:x + t] += 120            # left post
        img[y:y + osize, x + osize - t:x + osize] += 120   # right post
        img[y + osize // 2 - t // 2:y + osize // 2 + t // 2,
            x:x + osize] += 120                     # crossbar
        bbox = (x, y, osize, osize)
    return np.clip(img, 0, 255).astype(np.uint8), bbox


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from ccv_tpu.train import dpm as train_dpm

    rng = np.random.default_rng(7)
    posimgs, bboxes, bgimgs = [], [], []
    for _ in range(6):
        img, bbox = _scene(rng, obj=True)
        posimgs.append(img)
        bboxes.append(bbox)
    for _ in range(5):
        img, _ = _scene(rng, obj=False)
        bgimgs.append(img)
    params = train_dpm.DpmTrainParams(
        components=1, parts=4, min_area=1200, max_area=2500,
        symmetric=True, relabels=1, data_minings=1, iterations=6,
        negative_cache_size=20, include_overlap=0.6,
        detector=train_dpm.DpmParams(interval=2, threshold=0.0), seed=3)
    workdir = str(tmp_path_factory.mktemp("dpmmodel"))
    model = train_dpm.mixture_model_new(
        posimgs, bboxes, bgimgs, negnum=16, dir=workdir, params=params,
        log=lambda *a: None)
    return model, params, workdir, rng


def test_dpm_train_shapes_and_symmetry(trained):
    from ccv_tpu.train.dpm import SYM_LUT, _mirror

    model, params, _, _ = trained
    assert model.count == 1
    root = model.roots[0]
    assert root.w.shape[2] == 31
    assert len(root.parts) == params.parts
    # the symmetric prior keeps the root filter mirror-symmetric
    np.testing.assert_allclose(root.w, _mirror(root.w), atol=5e-3)
    # mirror is an involution
    r = np.random.default_rng(0).normal(size=(3, 5, 31)).astype(np.float32)
    np.testing.assert_array_equal(_mirror(_mirror(r)), r)
    assert sorted(SYM_LUT.tolist()) == list(range(31))


def test_dpm_train_separates_heldout(trained):
    from ccv_tpu.train import dpm as train_dpm

    model, params, _, rng = trained
    pos_scores, neg_scores = [], []
    for _ in range(4):
        img, bbox = _scene(rng, obj=True)
        v = train_dpm._collect_best(img.astype(np.float32), model, bbox,
                                    params.include_overlap, params.detector)
        assert v is not None
        pos_scores.append(train_dpm._vector_score(model, v))
    for _ in range(4):
        img, _ = _scene(rng, obj=False)
        vs = train_dpm._collect_all(np.random.default_rng(0),
                                    img.astype(np.float32), model,
                                    params.detector, threshold=-np.inf,
                                    enough=1)
        neg_scores.append(train_dpm._vector_score(model, vs[0]))
    assert np.mean(pos_scores) > np.mean(neg_scores)


def test_dpm_checkpoint_roundtrip_and_detect(trained):
    import os

    from ccv_tpu.detectors import dpm as dpm_detect
    from ccv_tpu.train.dpm import write_mixture_model

    model, params, workdir, rng = trained
    path = os.path.join(workdir, "model")
    assert open(path).read(1) == "."  # done marker
    again = dpm_detect.read_mixture_model(path)
    root, root2 = model.roots[0], again.roots[0]
    np.testing.assert_array_equal(root.w, root2.w)
    assert root.beta == root2.beta
    for p, p2 in zip(root.parts, root2.parts):
        np.testing.assert_array_equal(p.w, p2.w)
        assert (p.x, p.y, p.dx, p.dy, p.dxx, p.dyy, p.counterpart) == \
            (p2.x, p2.y, p2.dx, p2.dy, p2.dxx, p2.dyy, p2.counterpart)
    # the trained model drives the detector end-to-end
    img, bbox = _scene(rng, obj=True)
    comps = dpm_detect.detect(
        img.astype(np.float32), again,
        dpm_detect.DpmParams(interval=2, threshold=-0.5, min_neighbors=1))
    assert comps, "trained DPM found nothing on a positive scene"
    x, y, w, h = bbox
    best_iou = 0.0
    for c in comps:
        ix = max(0, min(c.x + c.width, x + w) - max(c.x, x))
        iy = max(0, min(c.y + c.height, y + h) - max(c.y, y))
        inter = ix * iy
        union = c.width * c.height + w * h - inter
        best_iou = max(best_iou, inter / union)
    assert best_iou > 0.3, best_iou
