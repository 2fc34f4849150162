"""Full-cascade Pallas kernel (ops/pallas/scd_cascade.py) vs a NumPy
oracle that replicates the reference per-window evaluation
(_ccv_scd_run_feature_at + stage walk, ccv_scd.c:445/1719) in f32 with
the kernel's exact corner-add order."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ccv_tpu.detectors import scd
from ccv_tpu.ops.pallas import scd_cascade

_THETA = 2.0 / math.sqrt(32.0)


def _oracle(sat_cf, cascade, ny, nx, step):
    """vs per (stage, window) + final passed mask, f32, kernel op order."""
    sat = np.asarray(sat_cf, np.float32)  # (8, H1, W1)
    wy = np.arange(ny)[:, None] * step    # (ny, 1)
    wx = np.arange(nx)[None, :] * step    # (1, nx)
    F = cascade.n_features
    vs_stage = np.zeros((cascade.n_stages, ny, nx), np.float32)
    for f in range(F):
        boxes = np.empty((4, 8, ny, nx), np.float32)
        for b in range(4):
            sy, dy = cascade.sy[f, b], cascade.dy[f, b]
            sx, dx = cascade.sx[f, b], cascade.dx[f, b]
            boxes[b] = (sat[:, wy + sy, wx + sx] - sat[:, wy + sy, wx + dx]
                        - sat[:, wy + dy, wx + sx]
                        + sat[:, wy + dy, wx + dx])
        nsq = np.sum(boxes * boxes, axis=(0, 1), dtype=np.float32)
        inv = np.float32(1.0) / (np.sqrt(nsq, dtype=np.float32)
                                 + np.float32(1e-6))
        u = np.clip(boxes * inv, -_THETA, _THETA).astype(np.float32)
        ss2 = np.sum(u * u, axis=(0, 1), dtype=np.float32)
        inv2 = np.float32(1.0) / (np.sqrt(ss2, dtype=np.float32)
                                  + np.float32(1e-6))
        w = cascade.w[f].reshape(4, 8, 1, 1)
        dot = np.sum(u * w, axis=(0, 1), dtype=np.float32)
        logit = dot * inv2 + cascade.bias[f]
        vs_stage[cascade.stage_of[f]] += np.tanh(0.5 * logit,
                                                 dtype=np.float32)
    passed = np.ones((ny, nx), bool)
    for s in range(cascade.n_stages):
        passed &= vs_stage[s] > cascade.thresholds[s]
    return vs_stage, passed


def _synth_cascade(rng, n_stages=4, feats_per_stage=(2, 3, 4, 5), wh=16):
    F = sum(feats_per_stage)
    sx = rng.integers(0, wh - 4, (F, 4)).astype(np.int32)
    sy = rng.integers(0, wh - 4, (F, 4)).astype(np.int32)
    dx = (sx + rng.integers(2, 5, (F, 4))).astype(np.int32)
    dy = (sy + rng.integers(2, 5, (F, 4))).astype(np.int32)
    stage_of = np.repeat(np.arange(n_stages),
                         feats_per_stage).astype(np.int32)
    return scd.ScdClassifierCascade(
        width=wh, height=wh, margin=(0, 0, 0, 0),
        stage_counts=np.asarray(feats_per_stage, np.int32),
        thresholds=np.zeros(n_stages, np.float32),
        sx=sx, sy=sy, dx=dx, dy=dy,
        bias=rng.normal(0, 0.5, F).astype(np.float32),
        w=rng.normal(0, 1, (F, 32)).astype(np.float32),
        stage_of=stage_of)


@pytest.mark.parametrize("ny,nx", [(11, 21), (8, 128), (17, 140)])
def test_cascade_kernel_matches_oracle(ny, nx):
    rng = np.random.default_rng(7)
    step = 4
    cascade = _synth_cascade(rng)
    tabs = scd._cascade_tables(cascade)
    full = scd._full_phase(tabs, cascade)
    all_off = tabs["all_off"]
    th = int(all_off[:, 0].max()) // step + 1
    tw = int(all_off[:, 1].max()) // step + 1

    H1 = (ny - 1) * step + cascade.height + 1
    W1 = (nx - 1) * step + cascade.width + 1
    sat_cf = rng.normal(0, 10, (8, H1, W1)).astype(np.float32)

    vs_stage, passed_o = _oracle(sat_cf, cascade, ny, nx, step)
    # thresholds at per-stage medians so every stage kills real windows
    # (exercises the early-exit paths without emptying the survivor set)
    med = [float(np.median(vs_stage[s])) for s in range(cascade.n_stages)]
    cascade.thresholds[:] = np.asarray(med, np.float32)
    for k in ("_tables",):
        if hasattr(cascade, k):
            object.__delattr__(cascade, k)
    tabs = scd._cascade_tables(cascade)
    full = scd._full_phase(tabs, cascade)
    vs_stage, passed_o = _oracle(sat_cf, cascade, ny, nx, step)

    gy, gx, hs_pad, ws_pad = scd_cascade.pad_dims(ny, nx, th, tw)
    planes = scd._planes_cf(jnp.asarray(sat_cf), hs_pad, ws_pad, step)
    conf, passed = jax.device_get(scd_cascade.cascade_eval(
        planes, full, step, ny, nx, th, tw, gy, gx))
    passed = passed.reshape(ny, nx)
    conf = conf.reshape(ny, nx)

    assert passed_o.any(), "oracle survivor set empty — test is vacuous"
    # survivors must match except where a stage sum sits within float
    # noise of its threshold
    margin_ok = np.ones((ny, nx), bool)
    for s in range(cascade.n_stages):
        margin_ok &= np.abs(vs_stage[s] - cascade.thresholds[s]) > 1e-4
    assert (passed == passed_o)[margin_ok].all()
    # final-stage confidence for surviving windows
    both = passed & passed_o
    assert both.any()
    np.testing.assert_allclose(conf[both],
                               vs_stage[-1][both], atol=2e-4, rtol=1e-5)


def test_cascade_kernel_multi_level():
    """One (L, gy, gx)-grid call == per-level calls (octave batching)."""
    rng = np.random.default_rng(3)
    step = 4
    cascade = _synth_cascade(rng)
    tabs = scd._cascade_tables(cascade)
    full = scd._full_phase(tabs, cascade)
    all_off = tabs["all_off"]
    th = int(all_off[:, 0].max()) // step + 1
    tw = int(all_off[:, 1].max()) // step + 1

    dims = np.array([[13, 140], [9, 100], [5, 60]], np.int32)
    gy, gx, hs_pad, ws_pad = scd_cascade.pad_dims(
        int(dims[:, 0].max()), int(dims[:, 1].max()), th, tw)
    planes_l, singles = [], []
    for (ny, nx) in dims:
        H1 = (ny - 1) * step + cascade.height + 1
        W1 = (nx - 1) * step + cascade.width + 1
        sat_cf = rng.normal(0, 10, (8, H1, W1)).astype(np.float32)
        planes = scd._planes_cf(jnp.asarray(sat_cf), hs_pad, ws_pad, step)
        planes_l.append(planes)
        singles.append(jax.device_get(scd_cascade.cascade_eval(
            planes, full, step, int(ny), int(nx), th, tw, gy, gx)))
    conf, passed = jax.device_get(scd_cascade.cascade_eval_levels(
        jnp.stack(planes_l), full, step, dims, th, tw, gy, gx))
    for li, (ny, nx) in enumerate(dims):
        np.testing.assert_allclose(
            conf[li, :ny, :nx].reshape(-1), singles[li][0], rtol=1e-6)
        np.testing.assert_array_equal(
            passed[li, :ny, :nx].reshape(-1), singles[li][1])


def test_planes_cf_layout():
    rng = np.random.default_rng(0)
    sat = rng.normal(size=(8, 30, 41)).astype(np.float32)
    step = 4
    hs_pad, ws_pad = 12, 16
    planes = np.asarray(scd._planes_cf(jnp.asarray(sat), hs_pad, ws_pad,
                                       step))
    assert planes.shape == (16, 8, hs_pad, ws_pad)
    for (py, px, c, h, w) in [(0, 0, 0, 0, 0), (1, 3, 2, 5, 7),
                              (3, 3, 7, 7, 10), (2, 1, 4, 6, 9)]:
        y, x = h * step + py, w * step + px
        want = sat[c, y, x] if (y < 30 and x < 41) else 0.0
        assert planes[py * step + px, c, h, w] == np.float32(want)
