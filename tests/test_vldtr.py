"""Accuracy-harness scoring tests (utils/deteval.py, the vldtr twins).

Hand-computed expected values for each DetEval branch (the reference
protocol: bin/swtvldtr.rb), the dpm/icf overlap criterion, the CMU face
protocol, and the cnn top-k miss rates.
"""

import math
import os
import subprocess
import sys

from ccv_tpu.utils.deteval import (cmu_face_score, deteval, overlap_score,
                                   parse_rect_file, topk_miss)

BIN = os.path.join(os.path.dirname(__file__), "..", "bin")


def R(x, y, w, h):
    return dict(x=float(x), y=float(y), width=float(w), height=float(h))


def test_deteval_one_to_one():
    truth = {"a": [R(0, 0, 100, 50)]}
    est = {"a": [R(2, 2, 100, 50)]}  # heavy overlap, centered
    p, r = deteval(truth, est)
    assert p == 1.0 and r == 1.0


def test_deteval_miss():
    truth = {"a": [R(0, 0, 100, 50)]}
    est = {"a": [R(500, 500, 100, 50)]}
    p, r = deteval(truth, est)
    assert p == 0.0 and r == 0.0


def test_deteval_one_truth_many_detections():
    # one 200-wide truth word detected as two exact halves:
    # recall += 0.8, precision += 0.8 / (1 + ln 2)  (swtvldtr.rb:99-103)
    truth = {"a": [R(0, 0, 200, 50)]}
    est = {"a": [R(0, 0, 100, 50), R(100, 0, 100, 50)]}
    p, r = deteval(truth, est)
    assert abs(r - 0.8) < 1e-9
    assert abs(p - (0.8 / (1 + math.log(2))) / 2) < 1e-9


def test_deteval_one_detection_many_truths():
    # two adjacent truth words merged into one detection:
    # precision += 0.8, recall += 0.8 / (1 + ln 2)  (swtvldtr.rb:128-132)
    truth = {"a": [R(0, 0, 100, 50), R(100, 0, 100, 50)]}
    est = {"a": [R(0, 0, 200, 50)]}
    p, r = deteval(truth, est)
    assert abs(p - 0.8) < 1e-9
    assert abs(r - (0.8 / (1 + math.log(2))) / 2) < 1e-9


def test_overlap_score_duplicates_ignored():
    truth = {"a": [R(0, 0, 100, 100)]}
    dets = {"a": [R(0, 0, 100, 100), R(5, 5, 100, 100), R(500, 0, 10, 10)]}
    tp, fa, total = overlap_score(truth, dets)
    # first matches (tp), second re-matches the found box (neither),
    # third misses (fa)
    assert (tp, fa, total) == (1, 1, 1)


def test_cmu_face_score():
    face = {k: dict(x=50.0, y=50.0) for k in
            ("left_eye", "right_eye", "nose", "left_mouth", "center_mouth",
             "right_mouth")}
    truth = {"img": [face]}
    hits = {"img": [R(30, 30, 40, 40)]}       # relaxed box contains 50,50
    tp, fa, total = cmu_face_score(truth, hits)
    assert (tp, fa, total) == (1, 0, 1)
    misses = {"img": [R(200, 200, 40, 40)], "other": [R(0, 0, 10, 10)]}
    tp, fa, total = cmu_face_score(truth, misses)
    assert (tp, fa, total) == (0, 2, 1)


def test_topk_miss():
    truth = [3, 7, 9]
    ranks = [[3, 1, 2, 4, 5], [1, 7, 2, 4, 5], [1, 2, 4, 5, 6]]
    m1, m5 = topk_miss(truth, ranks)
    assert abs(m1 - 2 / 3) < 1e-9
    assert abs(m5 - 1 / 3) < 1e-9


def test_swtvldtr_cli_end_to_end(tmp_path):
    """The CLI twin scores a perfect estimate at 100/100/100."""
    golden = os.path.join(os.path.dirname(__file__), "data",
                          "text_test.swt.txt")
    rects = [line.split()[:4] for line in open(golden)
             if len(line.split()) >= 4]
    assert rects, "golden SWT fixture missing rects"
    body = "text_test.png\n" + "\n".join(" ".join(r) for r in rects) + "\n"
    t = tmp_path / "truth.txt"
    e = tmp_path / "est.txt"
    t.write_text(body)
    e.write_text(body)
    out = subprocess.run(
        [sys.executable, os.path.join(BIN, "swtvldtr.py"), str(t), str(e)],
        capture_output=True, text=True, check=True).stdout
    assert "precision: 100.0%" in out and "recall: 100.0%" in out, out


def test_parse_rect_file(tmp_path):
    f = tmp_path / "r.txt"
    f.write_text("img1.png\n1 2 30 40\n5 6 70 80 0.9\nimg2.png\n-1 -2 3 4\n")
    d = parse_rect_file(str(f))
    assert len(d["img1.png"]) == 2 and len(d["img2.png"]) == 1
    assert d["img2.png"][0]["x"] == -1.0
