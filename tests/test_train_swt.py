"""SWT parameter search (swtcreate twin) + Wolf evaluator tests."""

import numpy as np
import pytest

from ccv_tpu.train.swt import Range, evaluate_wolf, optimize_params


def test_wolf_one_to_one():
    truth = [(10, 10, 50, 20)]
    words = [(11, 11, 49, 19)]
    p, r = evaluate_wolf(words, truth)
    assert p == 1.0 and r == 1.0


def test_wolf_one_to_many():
    truth = [(10, 10, 100, 20)]
    words = [(10, 10, 48, 20), (60, 10, 50, 20)]  # two pieces of one word
    p, r = evaluate_wolf(words, truth)
    assert 0 < r <= 0.8 and 0 < p <= 0.8


def test_wolf_miss():
    p, r = evaluate_wolf([(200, 200, 10, 10)], [(10, 10, 50, 20)])
    assert p == 0.0 and r == 0.0


@pytest.mark.slow
def test_optimize_params_improves():
    import os

    from ccv_tpu.core.io import read
    from ccv_tpu.detectors import swt

    DATA = os.path.join(os.path.dirname(__file__), "data")
    img = read(os.path.join(DATA, "text_test.png")).numpy()
    truth = [tuple(map(int, line.split())) for line in
             open(os.path.join(DATA, "text_test.swt.txt")).read().split("\n")
             if line]
    # start from a deliberately bad min_height and let the search repair it
    bad = swt.SwtParams(min_height=60)
    base_words = swt.detect_words(img, bad)
    best = optimize_params(
        [img], [truth], {"min_height": Range(8, 26, 60)}, base=bad,
        iterations=2, integer_fields=("min_height",))
    assert best.min_height < 60
    p, r = evaluate_wolf(swt.detect_words(img, best), truth)
    base_p, base_r = evaluate_wolf(base_words, truth)
    assert r > base_r
