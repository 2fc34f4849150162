"""SCD face-detector fidelity tests.

Goldens generated with the reference implementation (a harness linking the
reference's libccv ran `ccv_scd` and `ccv_scd_detect_objects` with
min_neighbors=0 and fully-open stage thresholds on tests/data/crop180.png):

- crop180.scdmap.bin      the 11-channel ccv_scd feature map
- crop180.scd_open.txt    every sliding-window rect + confidence
- face_low.sqlite3        face.sqlite3 with thresholds dropped to -1000

Full-image parity (chessbox 500x500, 53841 windows, confidences within
5.5e-3) was verified against the same oracle out-of-band.
"""

from conftest import reference_path
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")

from ccv_tpu.core.io import read, IO_RGB_COLOR
from ccv_tpu.detectors import scd


@pytest.fixture(scope="module")
def crop():
    return read(os.path.join(DATA, "crop180.png"), IO_RGB_COLOR)


@pytest.mark.tpu
def test_scd_map_matches_reference(crop):
    golden = read(os.path.join(DATA, "crop180.scdmap.bin")).numpy()
    mine = np.asarray(scd.scd_map(crop.array))
    assert mine.shape == golden.shape
    # gradient channels (0-7) are integer-exact sobel outputs
    np.testing.assert_array_equal(mine[..., :8], golden[..., :8])
    # LUV channels go through the cube-root LUT; float tolerance
    np.testing.assert_allclose(mine[..., 8:], golden[..., 8:], atol=1e-4)


@pytest.mark.tpu
@pytest.mark.slow
def test_scd_detect_window_parity(crop):
    casc = scd.load_cascade(os.path.join(DATA, "face_low.sqlite3"))
    out = scd.detect(crop.array, casc, scd.ScdParams(min_neighbors=0))
    mine = {(int(c.x), int(c.y), int(c.width), int(c.height)): c.confidence
            for c in out}
    ref = {}
    with open(os.path.join(DATA, "crop180.scd_open.txt")) as f:
        for line in f:
            x, y, w, h, conf = line.split()
            ref[(int(x), int(y), int(w), int(h))] = float(conf)
    assert set(mine) == set(ref), (
        f"window sets differ: {len(mine)} vs {len(ref)}; "
        f"only mine: {list(set(mine) - set(ref))[:3]}; "
        f"only ref: {list(set(ref) - set(mine))[:3]}")
    diffs = [abs(mine[k] - ref[k]) for k in ref]
    assert max(diffs) < 2e-2, f"max confidence diff {max(diffs)}"


@pytest.mark.slow
def test_scd_merge_min_neighbors(crop):
    # grouping keeps only clusters of >= min_neighbors windows
    casc = scd.load_cascade(os.path.join(DATA, "face_low.sqlite3"))
    all_dets = scd.detect(crop.array, casc, scd.ScdParams(min_neighbors=0))
    merged = scd.detect(crop.array, casc, scd.ScdParams(min_neighbors=2))
    assert len(merged) < len(all_dets)
    assert all(c.neighbors >= 2 for c in merged)


@pytest.mark.slow
def test_scd_real_cascade_no_faces(crop):
    # the real cascade should reject a chessboard crop entirely
    casc = scd.load_cascade(reference_path("samples/face.sqlite3"))
    out = scd.detect(crop.array, casc)
    assert out == []


@pytest.mark.tpu
def test_scd_window_parity_small(crop):
    """Default-tier gate: interval=1 pyramid (4 level programs instead of
    16) against a reference oracle generated with the same params
    (tests/data/gen/gen_fast.c)."""
    casc = scd.load_cascade(os.path.join(DATA, "face_low.sqlite3"))
    out = scd.detect(crop.array, casc,
                     scd.ScdParams(min_neighbors=0, interval=1))
    mine = {(int(c.x), int(c.y), int(c.width), int(c.height)): c.confidence
            for c in out}
    ref = {}
    for line in open(os.path.join(DATA, "crop180.scd_i1.txt")):
        x, y, w, h, conf = line.split()
        ref[(int(x), int(y), int(w), int(h))] = float(conf)
    assert set(mine) == set(ref), (len(mine), len(ref))
    diffs = [abs(mine[k] - ref[k]) for k in ref]
    assert max(diffs) < 6e-3, max(diffs)


@pytest.mark.tpu
@pytest.mark.slow
def test_scd_demo_photo_detections_match_reference():
    """End-to-end gate on the reference's own SCD demo photo: the merged
    boxes must equal scddetect's (tests/data/face_photo.scd.txt golden).

    This is the round-2 real-chip regression: bf16 MXU box sums killed 17
    of the 26 surviving windows and shifted a merged box below IoU 0.5 —
    while every CPU-tier window-parity gate stayed green. Runs in the
    --slow CPU tier and the --tpu real-chip tier."""
    photo = reference_path("site/photo/2012-06-29-face.png")
    if not os.path.isfile(photo):
        pytest.skip("demo photo not in reference checkout")
    img = read(photo, IO_RGB_COLOR)
    casc = scd.load_cascade(reference_path("samples/face.sqlite3"))
    out = scd.detect(img.array, casc)
    golden = []
    for line in open(os.path.join(DATA, "face_photo.scd.txt")):
        p = line.split()
        if len(p) >= 4:
            golden.append(tuple(int(float(v)) for v in p[:4]))
    mine = sorted((c.x, c.y, c.width, c.height) for c in out)
    assert len(mine) == len(golden), (mine, sorted(golden))
    for g in sorted(golden):
        assert any(max(abs(m[0] - g[0]), abs(m[1] - g[1]),
                       abs(m[2] - g[2])) <= 2 for m in mine), (g, mine)
