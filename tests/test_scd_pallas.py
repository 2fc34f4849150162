"""Pallas phase-A kernel vs the XLA formulation (TPU only — the kernel
is Mosaic-compiled; the CPU tier exercises the XLA path instead)."""

import jax
import numpy as np
import pytest

tpu_only = pytest.mark.skipif(jax.default_backend() == "cpu",
                              reason="pallas TPU kernel")


@pytest.mark.tpu
@tpu_only
def test_phase_a_kernel_matches_f32_xla():
    import jax.numpy as jnp

    from ccv_tpu.core import algebra
    from ccv_tpu.core.io import read, IO_RGB_COLOR
    from ccv_tpu.detectors import scd as S
    from ccv_tpu.ops.pallas import scd_phase

    img = read("/root/repo/tests/data/crop180.png", IO_RGB_COLOR)
    cascade = S.load_cascade("/root/repo/tests/data/face_low.sqlite3")
    params = S.ScdParams()
    a = jnp.asarray(np.asarray(img.array))
    specs, _ = S._level_specs(a.shape[0], a.shape[1], cascade, params)
    tabs = S._cascade_tables(cascade)
    (octave, k, rows, cols, ny, nx, scale) = specs[0]
    step = params.step_through
    phase_a = tabs["phase_a"]
    mo_y = int(tabs["all_off"][:, 0].max())
    mo_x = int(tabs["all_off"][:, 1].max())
    th, tw = mo_y // step + 1, mo_x // step + 1
    margin = cascade.margin
    pads = [(margin[1], margin[3]), (margin[0], margin[2]), (0, 0)]

    @jax.jit
    def kernel_path(src):
        image = jnp.pad(src, pads)
        sat8 = algebra.sat_mxu(S.scd_map(image)[..., :8],
                               padding=algebra.PADDING_ZERO)
        return scd_phase.phase_a(sat8, phase_a, step, ny, nx, th, tw)

    @jax.jit
    def xla_path(src):
        image = jnp.pad(src, pads)
        sat8 = algebra.sat_mxu(S.scd_map(image)[..., :8],
                               padding=algebra.PADDING_ZERO)
        planes, th_, tw_ = S._phase_planes(sat8, ny, nx, mo_y, mo_x, step)
        D = S._grid_corner_slices(planes, phase_a["offsets"], ny, nx, step)
        v, p = S._surf_from_D(D, phase_a)
        return v[:, -1], p

    old = S.TPU_EXACT_BOX_SUMS
    S.TPU_EXACT_BOX_SUMS = True  # f32-exact XLA reference
    try:
        ck, pk = map(np.asarray, kernel_path(a))
        cx, px = map(np.asarray, xla_path(a))
    finally:
        S.TPU_EXACT_BOX_SUMS = old
    assert (pk == px).all(), (int(pk.sum()), int(px.sum()))
    np.testing.assert_allclose(ck, cx, atol=1e-4)
