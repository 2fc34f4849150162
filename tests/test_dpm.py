"""DPM parity vs reference oracles (tests/data/gen/gen_dpm.c).

Note: the oracles were generated from a reference build with two upstream
bugs fixed (kissfft multi-tile filter garbage; model-repack OOB read) —
see tests/data/gen/README.md.
"""

from conftest import reference_path
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_filter_alignment():
    """ccv_filter+ccv_flatten (correlation, zero pad, same size)."""
    import jax.numpy as jnp

    from ccv_tpu.detectors.dpm import _corr31

    toks = open(os.path.join(DATA, "dpm_filter_probe.txt")).read().split()
    pos = 0
    n = int(toks[pos]); pos += 1
    for _ in range(n):
        ar, ac, br, bc, ch, fr, fc = map(int, toks[pos:pos + 7]); pos += 7
        golden = np.array(toks[pos:pos + fr * fc], np.float32).reshape(fr, fc)
        pos += fr * fc
        a = (np.sin(np.arange(ar * ac * ch) * 0.37)
             + 0.01 * np.arange(ar * ac * ch)).astype(np.float32).reshape(ar, ac, ch)
        b = np.cos(np.arange(br * bc * ch) * 0.53).astype(np.float32).reshape(br, bc, ch)
        mine = np.asarray(_corr31(jnp.asarray(a), b))
        assert mine.shape == golden.shape
        assert np.abs(mine - golden).max() < 2e-3, (br, bc, ch)


def test_gsedt():
    """GSEDT (CCV_NEGATIVE) values + argmin offsets vs the reference."""
    from ccv_tpu.detectors.dpm import _gsedt

    rows = open(os.path.join(DATA, "dpm_gsedt_probe.txt")).read().split("\n")
    R, C = map(int, rows[0].split())
    vals = np.array([r.split() for r in rows[1:1 + R * C]], np.float64)
    g = (np.sin(np.arange(R * C) * 0.71) * 3.0).astype(np.float32).reshape(R, C)
    out, mx, my = _gsedt(g, 0.05, -0.03, 0.11, 0.09)
    out, mx, my = np.asarray(out), np.asarray(mx), np.asarray(my)
    gv = vals[:, 0].reshape(R, C)
    gx = vals[:, 1].astype(int).reshape(R, C)
    gy = vals[:, 2].astype(int).reshape(R, C)
    assert np.abs(out - gv).max() < 1e-3
    assert (mx == gx).mean() > 0.99, (mx != gx).sum()
    assert (my == gy).mean() > 0.99, (my != gy).sum()


@pytest.fixture(scope="module")
def street_raw():
    from ccv_tpu.core.io import read, IO_RGB_COLOR
    from ccv_tpu.detectors import dpm

    img = read(reference_path("samples/street.png"), IO_RGB_COLOR)
    model = dpm.read_mixture_model(reference_path("samples/pedestrian.m"))
    return img, model


@pytest.mark.slow
def test_dpm_raw_windows(street_raw):
    """Window-level parity: every raw (min_neighbors=0) comp above 0.4."""
    from ccv_tpu.detectors import dpm

    img, model = street_raw
    out = dpm.detect(img.array, model,
                     dpm.DpmParams(min_neighbors=0, threshold=0.4))
    lines = open(os.path.join(DATA, "street.dpm_open.txt")).read().split("\n")
    n = int(lines[0])
    golden = [tuple(map(float, l.split())) for l in lines[1:1 + n]]
    assert len(out) >= n - 1, (len(out), n)
    matched = 0
    for gx, gy, gw, gh, gconf, gp in golden:
        for r in out:
            if (abs(r.x - gx) <= 3 and abs(r.y - gy) <= 3
                    and abs(r.width - gw) <= 3 and abs(r.height - gh) <= 3
                    and abs(r.confidence - gconf) < 0.05):
                matched += 1
                break
    assert matched >= n - 1, (matched, n)


@pytest.mark.slow
def test_dpm_grouped(street_raw):
    """End-to-end default-params detection matches dpmdetect."""
    from ccv_tpu.detectors import dpm

    img, model = street_raw
    out = dpm.detect(img.array, model, dpm.DpmParams())
    lines = open(os.path.join(DATA, "street.dpm_grouped.txt")).read().split("\n")
    n = int(lines[0])
    golden = [tuple(map(float, l.split())) for l in lines[1:1 + n]]
    assert len(out) == n, [dataclass_str(r) for r in out] if False else (len(out), n)
    for (gx, gy, gw, gh, gconf), r in zip(golden, sorted(out, key=lambda r: -r.confidence)):
        assert abs(r.x - gx) <= 3 and abs(r.y - gy) <= 3
        assert abs(r.width - gw) <= 4 and abs(r.height - gh) <= 4
        assert abs(r.confidence - gconf) < 0.05


def test_dpm_small_interval():
    """Default-tier gate: interval=0 pyramid (2 level programs vs 20)."""
    from ccv_tpu.core.io import read, IO_RGB_COLOR
    from ccv_tpu.detectors import dpm

    img = read(reference_path("samples/street.png"), IO_RGB_COLOR)
    model = dpm.read_mixture_model(reference_path("samples/pedestrian.m"))
    out = dpm.detect(img.array, model,
                     dpm.DpmParams(interval=0, min_neighbors=0,
                                   threshold=0.4))
    lines = [l for l in open(os.path.join(
        DATA, "street.dpm_i0.txt")).read().split("\n") if l]
    golden = [tuple(map(float, l.split())) for l in lines]
    assert len(out) == len(golden), (len(out), len(golden))
    matched = 0
    for gx, gy, gw, gh, gconf in golden:
        for r in out:
            if (abs(r.x - gx) <= 3 and abs(r.y - gy) <= 3
                    and abs(r.width - gw) <= 3 and abs(r.height - gh) <= 3
                    and abs(r.confidence - gconf) < 0.05):
                matched += 1
                break
    assert matched == len(golden), (matched, len(golden))
