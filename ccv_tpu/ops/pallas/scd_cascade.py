"""Pallas TPU kernel for the FULL SCD cascade — every stage, with
per-block early exit (reference hot loop: ccv_scd.c:1719-1768, where each
window walks the stages and exits on the first failing threshold).

The XLA formulation in scd.py evaluates phases A/B1 densely and compacts
survivors for B2; even with unit-stride plane slices it pays ~10 ms/level
in relayouts, corner-slice op overhead and the B2 tile gather. This kernel
is the TPU-native translation of the CPU early exit: the unit of
divergence is a (BY=8, BX=128) *block* of windows — one VPU tile — and a
whole stage is skipped for the block when no window in it is still alive.
Dead blocks (the overwhelming majority after the first 12-feature stages)
cost only the leading stages; live blocks run everything in VMEM with no
HBM round trips.

  grid step (i, j) = windows [i*8, i*8+8) x [j*128, j*128+128):
    1. async-copy the strip of phase planes HBM -> VMEM (strips overlap
       by the window tile extent, which BlockSpec can't express)
    2. alive := (row < ny) & (col < nx)   [ny, nx scalar-prefetched, so
       ONE compiled kernel serves every pyramid level of an octave]
    3. for each cascade stage (fully unrolled features):
         if alive-count == 0: skip (pl.when)
         every SURF box sum = 3 signed adds of (8ch, BY, BX) corner reads
         L2Hys normalize / clamp / renormalize / stump dot / tanh -> vs
         alive &= vs > threshold[stage]
    4. conf := last evaluated stage sum, passed := alive

Channels ride the leading axis of 3D (8, BY, BX) tiles: one traced op per
box instead of eight, which keeps the Mosaic module small even with all
~320 features unrolled.

Input layout: planes (step*step, 8, hs_pad, ws_pad) float32 — the (py, px)
phase planes of the zero-padded SAT with window-col as the lane dimension
(see scd.py _planes_cf), padded so every strip DMA stays in bounds.
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

BY = 8    # window rows per grid step (one sublane tile)
BX = 128  # window cols per grid step (one lane tile)

# bump on ANY kernel/layout change: versions the cross-process AOT
# executable cache key (detectors/scd.py _AotJit)
KERNEL_VERSION = 2


@functools.lru_cache(maxsize=None)
def _get_cascade_call(key, n_levels: int = 1):
    (corners, box_cidx, biases, stage_slices, thresholds,
     step, th, tw, gy, gx, hs_pad, ws_pad) = key
    # DMA slice shapes aligned to the (8, 128) f32 tiling
    sh = -(-(BY + th) // 8) * 8
    sw = -(-(BX + tw) // 128) * 128

    def kernel(dims_ref, planes_hbm, wmat_ref, conf_ref, pass_ref, strip,
               cnt, sem):
        # grid (L, gy, gx): one pallas_call serves EVERY pyramid level of
        # an octave (L Mosaic copies of this kernel would otherwise ride
        # the octave program — 26 MB of StableHLO and a 17-minute XLA
        # compile for the base octave measured in round 5)
        lv = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        ny = dims_ref[lv, 0]
        nx = dims_ref[lv, 1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (BY, BX), 0) + i * BY
        cols = jax.lax.broadcasted_iota(jnp.int32, (BY, BX), 1) + j * BX
        alive0 = (rows < ny) & (cols < nx)
        conf_ref[0] = jnp.zeros((BY, BX), jnp.float32)
        pass_ref[0] = alive0.astype(jnp.float32)
        cnt[0, 0] = jnp.sum(alive0.astype(jnp.int32))

        # whole block out of the window grid (level padding): skip the
        # strip DMA along with every stage
        @pl.when(cnt[0, 0] > 0)
        def _dma():
            cp = pltpu.make_async_copy(
                planes_hbm.at[lv, :, :, pl.ds(i * BY, sh),
                              pl.ds(j * BX, sw)],
                strip, sem)
            cp.start()
            cp.wait()

        for si, (f0, f1) in enumerate(stage_slices):
            @pl.when(cnt[0, 0] > 0)
            def _(si=si, f0=f0, f1=f1):
                vs = None
                for f in range(f0, f1):
                    cache = {}

                    def corner(d, _c=cache):
                        # (8ch, BY, BX) read shared across this feature's
                        # boxes (adjacent boxes share SAT corners)
                        if d not in _c:
                            pp, dy, dx = corners[d]
                            _c[d] = strip[pp, :, dy:dy + BY, dx:dx + BX]
                        return _c[d]

                    boxes = []
                    ss = None
                    for b in range(4):
                        c0, c1, c2, c3 = box_cidx[f * 4 + b]
                        val = (corner(c0) - corner(c1)
                               - corner(c2) + corner(c3))
                        boxes.append(val)
                        sq = val * val
                        ss = sq if ss is None else ss + sq
                    inv = 1.0 / (jnp.sqrt(jnp.sum(ss, axis=0)) + 1e-6)
                    ss2 = None
                    acc = None
                    for b, val in enumerate(boxes):
                        u = jnp.clip(val * inv[None], -_THETA, _THETA)
                        sq = u * u
                        ss2 = sq if ss2 is None else ss2 + sq
                        # channel weights: one (8, 1) column of the
                        # channel-major weight matrix input
                        wv = wmat_ref[:, f * 4 + b:f * 4 + b + 1]
                        t = u * wv.reshape(8, 1, 1)
                        acc = t if acc is None else acc + t
                    inv2 = 1.0 / (jnp.sqrt(jnp.sum(ss2, axis=0)) + 1e-6)
                    logit = jnp.sum(acc, axis=0) * inv2 + biases[f]
                    resp = jnp.tanh(0.5 * logit)
                    vs = resp if vs is None else vs + resp
                alive = (pass_ref[0] > 0.0) & (vs > thresholds[si])
                pass_ref[0] = alive.astype(jnp.float32)
                conf_ref[0] = vs
                cnt[0, 0] = jnp.sum(alive.astype(jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_levels, gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # planes, DMA'd
            pl.BlockSpec(memory_space=pltpu.VMEM),     # weights (8, F*4)
        ],
        out_specs=[
            pl.BlockSpec((1, BY, BX), lambda lv, i, j, *_: (lv, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BY, BX), lambda lv, i, j, *_: (lv, i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((step * step, 8, sh, sw), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_levels, gy * BY, gx * BX), jnp.float32),
            jax.ShapeDtypeStruct((n_levels, gy * BY, gx * BX), jnp.float32),
        ],
        # the big stages keep ~30 MB of corner/box tiles live; v5e has
        # 128 MB physical VMEM and this kernel has no double-buffering
        # pressure, so raise the default 16 MB scoped limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        # CPU tier (tests): emulate — production dispatch is TPU-only
        interpret=jax.default_backend() == "cpu",
    )


def _cascade_key(phase, step: int, th: int, tw: int, gy: int, gx: int,
                 hs_pad: int, ws_pad: int):
    """Hashable kernel-specialization key from a full-cascade phase-table
    dict (scd._phase_tables over ALL features, stage-ordered)."""
    offsets = np.asarray(phase["offsets"])
    corners = tuple(
        ((int(oy) % step) * step + int(ox) % step, int(oy) // step,
         int(ox) // step)
        for oy, ox in offsets)
    box_cidx = tuple(tuple(int(c) for c in row)
                     for row in np.asarray(phase["cidx"]))
    biases = tuple(float(b) for b in np.asarray(phase["bias"]))
    onehot = np.asarray(phase["onehot"])
    stage_slices = []
    for sidx in range(onehot.shape[1]):
        idx = np.nonzero(onehot[:, sidx])[0]
        stage_slices.append((int(idx[0]), int(idx[-1]) + 1))
    thresholds = tuple(float(t) for t in np.asarray(phase["thresholds"]))
    return (corners, box_cidx, biases, tuple(stage_slices),
            thresholds, step, th, tw, gy, gx, hs_pad, ws_pad)


def pad_dims(ny: int, nx: int, th: int, tw: int):
    """(gy, gx, hs_pad, ws_pad) for a window grid: grid blocks plus the
    strip overlap, aligned to the DMA tiling."""
    gy = -(-ny // BY)
    gx = -(-nx // BX)
    sh = -(-(BY + th) // 8) * 8
    sw = -(-(BX + tw) // 128) * 128
    return gy, gx, (gy - 1) * BY + sh, (gx - 1) * BX + sw


def _wmat(phase):
    # channel-major weights: wmat[c, f*4 + b] = w[f, b*8 + c]
    F = np.asarray(phase["w"]).shape[0]
    return jnp.asarray(np.asarray(phase["w"], np.float32)
                       .reshape(F, 4, 8).transpose(2, 0, 1)
                       .reshape(8, F * 4))


def cascade_eval(planes, phase, step: int, ny: int, nx: int, th: int,
                 tw: int, gy: int, gx: int):
    """(conf (ny*nx,), passed (ny*nx,)) for every window on the
    stride-`step` grid from phase planes (step*step, 8, hs_pad, ws_pad).

    `phase` covers the WHOLE cascade (scd._phase_tables over all
    features); conf is the last stage's response sum for windows that
    reached it. ny/nx ride a scalar-prefetch argument, so every level
    whose padded grid matches (gy, gx) shares one compiled kernel."""
    conf, passed = cascade_eval_levels(planes[None], phase, step,
                                       np.array([[ny, nx]]), th, tw,
                                       gy, gx)
    return (conf[0, :ny, :nx].reshape(ny * nx),
            passed[0, :ny, :nx].reshape(ny * nx))


def cascade_eval_levels(planes_l, phase, step: int, dims, th: int,
                        tw: int, gy: int, gx: int):
    """Whole-octave batch of cascade_eval: planes_l is
    (L, step*step, 8, hs_pad, ws_pad) — one phase-plane stack per pyramid
    level, all padded to the octave's largest (gy, gx) window grid — and
    dims is an (L, 2) host array of the real (ny, nx) per level. Returns
    (conf, passed) of shape (L, gy*BY, gx*BX), sliced [l, :ny, :nx] per
    level by the caller. ONE pallas_call (grid (L, gy, gx)) evaluates
    every level: blocks outside a level's real grid skip the strip DMA
    and all stages."""
    L = int(planes_l.shape[0])
    hs_pad, ws_pad = int(planes_l.shape[3]), int(planes_l.shape[4])
    call = _get_cascade_call(
        _cascade_key(phase, step, th, tw, gy, gx, hs_pad, ws_pad), L)
    dims_a = jnp.asarray(np.asarray(dims, np.int32).reshape(L, 2))
    conf, passed = call(dims_a, planes_l, _wmat(phase))
    return conf, passed > 0.0
