"""MSER parity vs the reference oracle (tests/data/gen/gen_mser.c)."""

from conftest import reference_path
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


def _load(name):
    with open(os.path.join(DATA, name)) as f:
        n = int(f.readline())
        rows = [tuple(map(int, line.split())) for line in f]
    assert len(rows) == n
    return rows


@pytest.mark.parametrize("direction,golden_file", [
    (1, "scene.mser.txt"), (-1, "scene.mser_b2d.txt")])
def test_mser_window_parity(direction, golden_file):
    from ccv_tpu.core.io import read, IO_GRAY
    from ccv_tpu.detectors import mser

    img = read(reference_path("samples/scene.png"), IO_GRAY).numpy()
    kps, labels = mser.mser(img, params=mser.MserParams(direction=direction))
    golden = _load(golden_file)
    assert len(kps) == len(golden), (len(kps), len(golden))
    mine = [(k.size, *k.keypoint, k.x, k.y, k.width, k.height) for k in kps]
    assert mine == golden


def test_mser_label_map():
    from ccv_tpu.core.io import read, IO_GRAY
    from ccv_tpu.detectors import mser

    img = read(reference_path("samples/scene.png"), IO_GRAY).numpy()
    kps, labels = mser.mser(img)
    hist = {l: c for l, c in
            (map(int, line.split()) for line in
             open(os.path.join(DATA, "scene.mser_labels.txt")))}
    vals, counts = np.unique(labels, return_counts=True)
    for v, c in zip(vals.tolist(), counts.tolist()):
        assert hist.get(v, 0) == c, (v, c, hist.get(v, 0))


def test_mscr_color_parity():
    """MSCR (_ccv_mscr, the color variant) vs reference oracle: exact
    region sizes, keypoints, and bounding boxes with msermatch params."""
    import math

    from ccv_tpu.core.io import read, IO_RGB_COLOR
    from ccv_tpu.detectors import mser

    img = np.asarray(read(reference_path("samples/scene.png"),
                          IO_RGB_COLOR).numpy())
    params = mser.MserParams(
        min_area=60, max_area=int(img.shape[0] * img.shape[1] * 0.3 + 0.5),
        min_diversity=0.2, area_threshold=1.01, min_margin=0.003,
        max_evolution=200, edge_blur_sigma=math.sqrt(3.0))
    kps, labels = mser.mscr(img, params)
    golden = _load("scene.mscr.txt")
    mine = [(k.size, *k.keypoint, k.x, k.y, k.width, k.height) for k in kps]
    assert mine == golden


def test_mser_any_dispatch():
    """ccv_mser dispatch twin: color -> MSCR, gray 8U -> set-union."""
    from ccv_tpu.core.io import read, IO_GRAY, IO_RGB_COLOR
    from ccv_tpu.detectors import mser

    gray = read(reference_path("samples/scene.png"), IO_GRAY).numpy()
    color = read(reference_path("samples/scene.png"), IO_RGB_COLOR).numpy()
    kg, _ = mser.mser_any(gray)
    kc, _ = mser.mser_any(color)
    assert len(kg) == 188  # the set-union oracle count
    assert len(kc) > 0      # MSCR path engaged (default params, unbounded
    #                         max_area -> superset of the msermatch oracle)
