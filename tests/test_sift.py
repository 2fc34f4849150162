"""SIFT fidelity tests.

Golden (tests/data/book.sift.txt) is the reference ccv_sift keypoint list
for samples/book.png (x, y, octave, level, scale, angle per row), produced
by a harness linking the reference libccv. Gate: >= 97% of reference
keypoints matched by ours within 1px and scale within 5%; keypoint count
within 2%; descriptor pipeline validated via match-count parity
(96 vs the reference's 97 matched pairs on book/scene, checked out-of-band).
"""

from conftest import reference_path
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
REF_SAMPLES = reference_path("samples")

from ccv_tpu.core.io import read, IO_GRAY
from ccv_tpu.detectors import sift


from conftest import requires_reference  # content-checked skip


@pytest.fixture(scope="module")
def book_result():
    # slow tier only (82s of CPU pyramid compiles)
    img = read(os.path.join(REF_SAMPLES, "book.png"), IO_GRAY)
    return sift.sift(img.array)


@requires_reference
@pytest.mark.slow
@pytest.mark.tpu
def test_sift_keypoints_match_reference(book_result):
    kps, desc = book_result
    ref = np.loadtxt(os.path.join(DATA, "book.sift.txt"))
    mine = np.array([[k["x"], k["y"], k["scale"]] for k in kps])
    assert abs(len(mine) - len(ref)) <= 0.02 * len(ref)
    from scipy.spatial import cKDTree

    tree = cKDTree(mine[:, :2])
    d, idx = tree.query(ref[:, :2], k=1)
    pos_ok = d < 1.0
    scale_ok = np.abs(mine[idx, 2] - ref[:, 4]) < 0.05 * ref[:, 4] + 1e-3
    frac = (pos_ok & scale_ok).mean()
    assert frac >= 0.97, f"only {frac:.3f} of reference keypoints matched"


@requires_reference
@pytest.mark.slow
@pytest.mark.tpu
def test_sift_angles_match_reference(book_result):
    # guards the fixed-grid orientation rewrite: every reference keypoint
    # must have a same-position keypoint of OURS whose angle agrees
    # (keypoints with multiple orientation peaks appear once per angle, so
    # nearest-neighbor pairing alone would mispair ~20% of twins)
    kps, desc = book_result
    ref = np.loadtxt(os.path.join(DATA, "book.sift.txt"))
    mine = np.array([[k["x"], k["y"], k["angle"]] for k in kps])
    from scipy.spatial import cKDTree

    tree = cKDTree(mine[:, :2])
    good = 0
    for r in ref:
        ids = tree.query_ball_point(r[:2], 1.0)
        if not ids:
            continue
        da = np.abs((mine[ids, 2] - r[5] + np.pi) % (2 * np.pi) - np.pi)
        if da.min() < 0.15:
            good += 1
    frac = good / len(ref)
    assert frac >= 0.95, f"only {frac:.3f} of reference angles matched"


@pytest.fixture(scope="module")
def crop_result():
    img = read(os.path.join(REF_SAMPLES, "book.png"), IO_GRAY)
    crop = np.asarray(img.numpy())[60:220, 60:220]
    return sift.sift(crop, sift.SiftParams(noctaves=2, up2x=False))


@requires_reference
def test_sift_descriptors_normalized(crop_result):
    kps, desc = crop_result
    assert desc.shape == (len(kps), 128)
    norms = np.linalg.norm(desc, axis=1)
    nz = norms > 0
    np.testing.assert_allclose(norms[nz], 1.0, atol=1e-4)
    # clipped at 0.2 then renormalized (can exceed 0.2 after renorm, but
    # stays a unit vector)
    assert desc.max() <= 1.0 + 1e-5


def test_match_ratio_test():
    rng = np.random.default_rng(0)
    d2 = rng.standard_normal((50, 128)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    # queries: exact copies of some rows -> should match decisively
    d1 = d2[[3, 7, 11]] + rng.standard_normal((3, 128)).astype(np.float32) * 0.001
    idx, ok = sift.match(d1, d2)
    assert list(idx) == [3, 7, 11]
    assert ok.all()


@requires_reference
def test_sift_keypoints_crop_small():
    """Default-tier gate: 160x160 crop, 2 octaves, no 2x upsampling
    (oracle: tests/data/gen/gen_fast.c)."""
    img = read(os.path.join(REF_SAMPLES, "book.png"), IO_GRAY)
    crop = np.asarray(img.numpy())[60:220, 60:220]
    kps, desc = sift.sift(crop, sift.SiftParams(noctaves=2, up2x=False))
    ref = np.loadtxt(os.path.join(DATA, "book_crop.sift.txt"))
    mine = np.array([[k["x"], k["y"], k["scale"]] for k in kps])
    assert abs(len(mine) - len(ref)) <= max(2, 0.03 * len(ref))
    from scipy.spatial import cKDTree

    tree = cKDTree(mine[:, :2])
    d, idx = tree.query(ref[:, :2], k=1)
    pos_ok = d < 1.0
    scale_ok = np.abs(mine[idx, 2] - ref[:, 4]) < 0.05 * ref[:, 4] + 1e-3
    frac = (pos_ok & scale_ok).mean()
    assert frac >= 0.95, f"only {frac:.3f} of reference keypoints matched"
