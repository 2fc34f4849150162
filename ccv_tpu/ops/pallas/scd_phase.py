"""Pallas TPU kernel for SCD cascade phase A (reference hot loop:
_ccv_scd_run_feature_at, lib/ccv_scd.c:445 — evaluated per window; here
one kernel instance evaluates a strip of BY x BX windows at once).

The XLA formulation (scd.py `_grid_corner_slices` + `_surf_from_D`)
spends most of its time relaying out the gathered corner tensor; this
kernel keeps everything in (BY, BX) vector registers:

  grid step (i, j) = windows [i*BY:(i+1)*BY] x [j*BX:(j+1)*BX]:
    1. async-copy the strip of phase planes HBM -> VMEM (strips overlap
       by the tile extent, which BlockSpec can't express — manual DMA)
    2. every SURF box sum = a few signed adds of static-offset (BY, BX)
       strip reads (corner loads shared across boxes via a trace cache)
    3. L2Hys normalize / stump logit / tanh / per-stage sums and
       threshold AND-reduce — pure VPU ops, fully unrolled over the
       phase's ~12 features (cascade weights baked in as constants; the
       program is specialized per cascade anyway)
  outputs: conf (last-stage sum) and passed, (BY, BX) each.

Input layout: planes_k (step*step, 8, Hs_pad, Ws_pad) float32 — the
(py, px) phase planes with window-col as the lane dimension, padded so
every static offset read stays in bounds:
  Hs_pad >= ceil(ny/BY)*BY + th,  Ws_pad >= ceil(nx/BX)*BX + tw.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_THETA = 2.0 / math.sqrt(32.0)

BY = 8    # window rows per grid step
BX = 128  # window cols per grid step (one lane tile)


@functools.lru_cache(maxsize=None)
def _get_phase_a_call(key):
    (corners, box_terms, weights, biases, stage_slices, thresholds, step,
     th, tw, ny, nx, hs_pad, ws_pad) = key
    F = len(biases)
    gy = -(-ny // BY)
    gx = -(-nx // BX)
    # DMA slice shapes must align to the (8, 128) f32 tiling
    sh = -(-(BY + th) // 8) * 8       # strip rows
    sw = -(-(BX + tw) // 128) * 128   # strip width in plane cols

    def kernel(planes_hbm, conf_ref, pass_ref, strip, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            planes_hbm.at[:, :, pl.ds(i * BY, sh),
                          pl.ds(j * BX, sw)],
            strip, sem)
        cp.start()
        cp.wait()

        cache = {}

        def corner(d, c):
            if (d, c) not in cache:
                pp, dy, dx = corners[d]
                cache[(d, c)] = strip[pp, c, dy:dy + BY, dx:dx + BX]
            return cache[(d, c)]

        passed = None
        v = None
        for si, (f0, f1) in enumerate(stage_slices):
            vs = None
            for f in range(f0, f1):
                boxes = []
                ss = None
                for b in range(4):
                    terms = box_terms[f * 4 + b]
                    for c in range(8):
                        val = None
                        for (d, wgt) in terms:
                            t = corner(d, c)
                            t = t if wgt == 1.0 else t * wgt
                            val = t if val is None else val + t
                        boxes.append(val)
                        sq = val * val
                        ss = sq if ss is None else ss + sq
                inv = 1.0 / (jnp.sqrt(ss) + 1e-6)
                ss2 = None
                clipped = []
                for val in boxes:
                    u = jnp.clip(val * inv, -_THETA, _THETA)
                    clipped.append(u)
                    sq = u * u
                    ss2 = sq if ss2 is None else ss2 + sq
                inv2 = 1.0 / (jnp.sqrt(ss2) + 1e-6)
                acc = None
                wf = weights[f]
                for k, u in enumerate(clipped):
                    t = u * wf[k]
                    acc = t if acc is None else acc + t
                logit = acc * inv2 + biases[f]
                resp = jnp.tanh(0.5 * logit)
                vs = resp if vs is None else vs + resp
            ok = vs > thresholds[si]
            passed = ok if passed is None else (passed & ok)
            v = vs
        conf_ref[:] = v
        pass_ref[:] = passed.astype(jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # planes, DMA'd
        ],
        out_specs=[
            pl.BlockSpec((BY, BX), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BY, BX), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gy * BY, gx * BX), jnp.float32),
            jax.ShapeDtypeStruct((gy * BY, gx * BX), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((step * step, 8, sh, sw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )


def _phase_key(phase, step, th, tw, ny, nx, hs_pad, ws_pad):
    offsets = np.asarray(phase["offsets"])
    corners = tuple(
        ((int(oy) % step) * step + int(ox) % step, int(oy) // step,
         int(ox) // step)
        for oy, ox in offsets)
    M = np.asarray(phase["M"])
    box_terms = tuple(
        tuple((int(d), float(M[r, d])) for d in np.nonzero(M[r])[0])
        for r in range(M.shape[0]))
    weights = tuple(tuple(float(x) for x in row)
                    for row in np.asarray(phase["w"]))
    biases = tuple(float(b) for b in np.asarray(phase["bias"]))
    onehot = np.asarray(phase["onehot"])
    stage_slices = []
    for sidx in range(onehot.shape[1]):
        idx = np.nonzero(onehot[:, sidx])[0]
        stage_slices.append((int(idx[0]), int(idx[-1]) + 1))
    thresholds = tuple(float(t) for t in np.asarray(phase["thresholds"]))
    return (corners, box_terms, weights, biases, tuple(stage_slices),
            thresholds, step, th, tw, ny, nx, hs_pad, ws_pad)


def phase_a(sat8, phase, step: int, ny: int, nx: int, th: int, tw: int):
    """(conf_last_stage (n,), passed (n,)) for every window on the
    stride-`step` grid, from the zero-padded SAT (H1, W1, 8).

    `phase` is scd._phase_tables output for the leading stages; feature
    order must be stage-contiguous (it is: features sorted by stage)."""
    gy = -(-ny // BY)
    gx = -(-nx // BX)
    hs_pad = gy * BY + (-(-(BY + th) // 8) * 8)
    ws_pad = gx * BX + (-(-(BX + tw) // 128) * 128) - BX
    Hp = hs_pad * step
    Wp = ws_pad * step
    s = jnp.pad(sat8, ((0, max(0, Hp - sat8.shape[0])),
                       (0, max(0, Wp - sat8.shape[1])), (0, 0)))
    s = s[:Hp, :Wp]
    # (Hs, step, Ws, step, 8) -> (step*step, 8, Hs, Ws): window-col lanes
    planes_k = s.reshape(hs_pad, step, ws_pad, step, 8).transpose(
        1, 3, 4, 0, 2).reshape(step * step, 8, hs_pad, ws_pad)

    call = _get_phase_a_call(
        _phase_key(phase, step, th, tw, ny, nx, hs_pad, ws_pad))
    conf, passed = call(planes_k)
    conf = conf[:ny, :nx].reshape(ny * nx)
    passed = passed[:ny, :nx].reshape(ny * nx) > 0.0
    return conf, passed
