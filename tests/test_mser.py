"""MSER parity vs the reference oracle (tests/data/gen/gen_mser.c)."""

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

    img = read("/root/reference/samples/scene.png", IO_GRAY).numpy()
    kps, labels = mser.mser(img, params=mser.MserParams(direction=direction))
    golden = _load(golden_file)
    assert len(kps) == len(golden), (len(kps), len(golden))
    mine = [(k.size, *k.keypoint, k.x, k.y, k.width, k.height) for k in kps]
    assert mine == golden


def test_mser_label_map():
    from ccv_tpu.core.io import read, IO_GRAY
    from ccv_tpu.detectors import mser

    img = read("/root/reference/samples/scene.png", IO_GRAY).numpy()
    kps, labels = mser.mser(img)
    hist = {l: c for l, c in
            (map(int, line.split()) for line in
             open(os.path.join(DATA, "scene.mser_labels.txt")))}
    vals, counts = np.unique(labels, return_counts=True)
    for v, c in zip(vals.tolist(), counts.tolist()):
        assert hist.get(v, 0) == c, (v, c, hist.get(v, 0))
