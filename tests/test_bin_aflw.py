"""bin/aflw twin: near-frontal filter + deformed 48x48 crops
(reference: bin/aflw.c)."""

import math
import os
import sys

import numpy as np

BIN = os.path.join(os.path.dirname(__file__), "..", "bin")
sys.path.insert(0, BIN)

import aflw  # noqa: E402


def test_frontal_filter():
    d = math.pi / 180
    assert aflw.frontal(0.0, 0.0, 0.0, 50, 50)
    assert not aflw.frontal(23 * d, 0.0, 0.0, 50, 50)   # roll
    assert not aflw.frontal(0.0, -23 * d, 0.0, 50, 50)  # pitch
    assert not aflw.frontal(0.0, 0.0, 21 * d, 50, 50)   # yaw
    assert not aflw.frontal(0.0, 0.0, 0.0, 14, 14)      # too small


def test_cli_end_to_end(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    (tmp_path / "img").mkdir()
    (tmp_path / "out").mkdir()
    img = rng.uniform(0, 255, (120, 160, 3)).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "img" / "a.png")
    (tmp_path / "ann.txt").write_text(
        "a.png 40 30 50 50 0.1 0.05 -0.1\n"   # kept
        "a.png 40 30 50 50 0.9 0.05 -0.1\n"   # roll too big
        "a.png 40 30 10 10 0.0 0.0 0.0\n")    # too small
    old = sys.argv
    sys.argv = ["aflw", str(tmp_path / "ann.txt"), str(tmp_path / "img"),
                str(tmp_path / "out")]
    try:
        assert aflw.main() == 1
    finally:
        sys.argv = old
    outs = sorted(os.listdir(tmp_path / "out"))
    assert outs == ["aflw-0000000-bw.png", "aflw-0000000-rgb.png"]
    a = np.asarray(Image.open(tmp_path / "out" / "aflw-0000000-rgb.png"))
    assert a.shape == (48, 48, 3)
    bw = np.asarray(Image.open(tmp_path / "out" / "aflw-0000000-bw.png"))
    assert bw.shape == (48, 48)
