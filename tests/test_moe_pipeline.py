"""Expert parallelism (nn/moe.py) and pipeline parallelism
(parallel/pipeline.py) on the 8-virtual-CPU-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ccv_tpu.nn import moe
from ccv_tpu.parallel import pipeline


def test_moe_forward_and_balance():
    cfg = moe.MoEConfig(dim=16, ff=32, experts=4, top_k=2,
                        capacity_factor=2.0)
    params = moe.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))
    out, aux = moe.forward(params, cfg, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    assert float(aux) > 0.0
    # with ample capacity, output is differentiable and non-trivial
    g = jax.grad(lambda p: jnp.sum(
        moe.forward(p, cfg, x)[0] ** 2))(params)
    gn = float(sum(jnp.sum(jnp.abs(v)) for v in jax.tree_util.tree_leaves(g)))
    assert np.isfinite(gn) and gn > 0.0


def test_moe_capacity_drops_tokens():
    cfg = moe.MoEConfig(dim=8, ff=8, experts=2, top_k=1)
    params = moe.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 8))
    full, _ = moe.forward(params, cfg, x, capacity=16)
    tight, _ = moe.forward(params, cfg, x, capacity=1)
    # with capacity 1 per expert, most tokens are dropped -> zeros
    nz_full = int(np.sum(np.abs(np.asarray(full)).sum(-1) > 1e-9))
    nz_tight = int(np.sum(np.abs(np.asarray(tight)).sum(-1) > 1e-9))
    assert nz_tight < nz_full
    assert nz_tight <= 2  # <= one token per expert


def test_moe_expert_parallel_matches_dense():
    cfg = moe.MoEConfig(dim=16, ff=32, experts=8, top_k=2,
                        capacity_factor=4.0)
    params = moe.init(jax.random.PRNGKey(2), cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 16))
    base, aux0 = moe.forward(params, cfg, x)

    mesh = Mesh(np.array(jax.devices()[:8]), ("expert",))
    psh = moe.shardings(params, mesh, axis="expert")
    params_sh = jax.tree_util.tree_map(jax.device_put, params, psh)
    x_sh = jax.device_put(x, NamedSharding(mesh, P()))
    with mesh:
        out, aux = jax.jit(lambda p, v: moe.forward(p, cfg, v))(
            params_sh, x_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(aux), float(aux0), rtol=1e-5)


def test_gpipe_matches_sequential():
    S, M, B, D = 4, 6, 2, 8
    mesh = Mesh(np.array(jax.devices()[:S]), ("stage",))
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, S)
    params = {
        "w": jnp.stack([jax.random.normal(k, (D, D)) * 0.3 for k in ks]),
        "b": jnp.stack([jax.random.normal(k, (D,)) * 0.1 for k in ks]),
    }

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    x_mb = jax.random.normal(jax.random.PRNGKey(1), (M, B, D))

    # sequential reference
    ref = x_mb
    for s in range(S):
        p_s = {"w": params["w"][s], "b": params["b"][s]}
        ref = jax.vmap(lambda x: stage_fn(p_s, x))(ref)

    with mesh:
        out = pipeline.gpipe(stage_fn, params, x_mb, mesh, axis="stage")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
