"""nn/aotcache: stable-key AOT executable cache (the XLA persistent
cache's key is process-unstable for big Mosaic octave programs — round 5
measurement; this cache keys on caller-provided strings instead)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.nn import aotcache


def test_load_or_compile_runs_and_counts(tmp_path, monkeypatch):
    monkeypatch.setenv("CCV_TPU_AOT_CACHE", str(tmp_path))

    @jax.jit
    def f(x):
        return x * 2.0 + 1.0

    x = jnp.arange(8, dtype=jnp.float32)
    stats = {}
    c1 = aotcache.load_or_compile(f, (x,), "test-key-v1", stats)
    np.testing.assert_allclose(np.asarray(c1(x)),
                               np.arange(8, dtype=np.float32) * 2 + 1)
    assert stats.get("aot_compiles", 0) == 1
    # second call with the same key: loads the serialized executable when
    # the backend supports serialization, else recompiles — either way
    # the result must be correct and the counters must move
    c2 = aotcache.load_or_compile(f, (x,), "test-key-v1", stats)
    np.testing.assert_allclose(np.asarray(c2(x)),
                               np.arange(8, dtype=np.float32) * 2 + 1)
    assert (stats.get("aot_hits", 0) + stats.get("aot_compiles", 0)) == 2
    # a different key never hits
    stats2 = {}
    aotcache.load_or_compile(f, (x,), "test-key-v2", stats2)
    assert stats2 == {"aot_compiles": 1}


def test_cache_dir_default_absent_on_cpu(monkeypatch):
    monkeypatch.delenv("CCV_TPU_AOT_CACHE", raising=False)
    if (os.environ.get("JAX_PLATFORM_NAME")
            or os.environ.get("JAX_PLATFORMS")) == "cpu":
        assert aotcache.cache_dir() is None
