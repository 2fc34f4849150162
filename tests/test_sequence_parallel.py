"""Ring attention (sequence parallelism) vs single-device SDPA on the
8-virtual-device CPU mesh (SURVEY 5.7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ccv_tpu.nn import ops
from ccv_tpu.parallel.sequence import ring_attention


@pytest.mark.parametrize("causal", [
    False, pytest.param(True, marks=pytest.mark.slow)])
def test_ring_attention_matches_sdpa(causal):
    # 4-way ring: the 8-way compile costs 2x on the 1-core tier and the
    # 8-device composition is covered by dryrun_multichip + composed tests
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("seq",))
    rng = np.random.default_rng(0)
    B, T, H, D = 2, 64, 2, 16
    q = rng.standard_normal((B, T, H, D), np.float32)
    k = rng.standard_normal((B, T, H, D), np.float32)
    v = rng.standard_normal((B, T, H, D), np.float32)
    out = np.asarray(ring_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), mesh, "seq",
                                    is_causal=causal))
    ref = np.asarray(ops.scaled_dot_product_attention(q, k, v,
                                                      is_causal=causal))
    assert np.abs(out - ref).max() < 1e-4, np.abs(out - ref).max()


def test_two_meshes_same_axis_name_different_sizes():
    """Regression: the ring unroll must come from each mesh's own axis
    size, not a process-global keyed by axis name (VERDICT r1 weak #6)."""
    rng = np.random.default_rng(1)
    B, T, H, D = 1, 32, 2, 8
    q = rng.standard_normal((B, T, H, D), np.float32)
    k = rng.standard_normal((B, T, H, D), np.float32)
    v = rng.standard_normal((B, T, H, D), np.float32)
    ref = np.asarray(ops.scaled_dot_product_attention(q, k, v))
    for n in (4, 2):  # interleave sizes under the SAME axis name
        mesh = Mesh(np.array(jax.devices()[:n]), ("seq",))
        out = np.asarray(ring_attention(jnp.asarray(q), jnp.asarray(k),
                                        jnp.asarray(v), mesh, "seq"))
        assert np.abs(out - ref).max() < 1e-4, (n, np.abs(out - ref).max())
