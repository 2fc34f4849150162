"""nn/autotune: measured per-shape kernel selection
(ccv_nnc_cmd_autotune analog, reference lib/nnc/ccv_nnc_cmd.c:344-577)."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccv_tpu.nn import autotune


@pytest.fixture(autouse=True)
def _isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("CCV_TPU_AUTOTUNE_CACHE",
                       str(tmp_path / "autotune.json"))
    monkeypatch.setattr(autotune, "_MEM", None)
    yield


def _slow(x):
    # artificially expensive same-result variant: O(n^2) scan vs O(n)
    y = x
    for _ in range(60):
        y = jnp.sort(y)
    return y + jnp.sum(x) * 0.0


def _fast(x):
    return jnp.sort(x)


def test_choose_picks_faster_variant_and_persists():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(4096),
                    jnp.float32)
    fn = autotune.choose("sorty", {"slow": _slow, "fast": _fast}, (x,))
    assert fn is _fast
    # decision persisted with timings for both variants
    table = autotune.decisions()
    (key, rec), = table.items()
    assert rec["choice"] == "fast"
    assert rec["ms"]["slow"] > rec["ms"]["fast"] > 0
    assert "float32[4096]" in key
    # a fresh process (cleared memory) reloads the decision from disk
    autotune._MEM = None
    with open(autotune.cache_path()) as f:
        assert json.load(f)[key]["choice"] == "fast"
    fn2 = autotune.choose("sorty", {"slow": _slow, "fast": _fast}, (x,))
    assert fn2 is _fast


def test_choose_under_tracing_uses_cache_or_default():
    x = jnp.zeros((512,), jnp.float32)
    picks = []

    @jax.jit
    def run(x):
        fn = autotune.choose("traced-op", {"a": _fast, "b": _slow}, (x,),
                             default="b")
        picks.append(fn)
        return fn(x)

    run(x)
    assert picks[-1] is _slow  # miss under tracing -> default, no record
    assert autotune.decisions() == {}
    # pre-tune eagerly, then the traced lookup must return the winner
    autotune.measure("traced-op", {"a": _fast, "b": _slow}, lambda: (x,))
    run.clear_cache()
    picks.clear()
    run(x)
    assert picks[-1] is _fast


def test_key_distinguishes_shape_dtype_and_extra():
    a = jnp.zeros((64,), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    c = jnp.zeros((64,), jnp.bfloat16)
    keys = {autotune._key("op", (t,), "") for t in (a, b, c)}
    assert len(keys) == 3
    assert autotune._key("op", (a,), "causal=True") != \
        autotune._key("op", (a,), "causal=False")


def test_failing_variant_never_wins():
    def broken(x):
        raise RuntimeError("no lowering")

    x = jnp.zeros((32,), jnp.float32)
    fn = autotune.choose("maybe", {"broken": broken, "ok": _fast}, (x,),
                         default="broken")
    assert fn is _fast
    rec = next(iter(autotune.decisions().values()))
    assert rec["ms"]["broken"] is None


def test_env_disable_skips_measurement(monkeypatch):
    monkeypatch.setenv("CCV_TPU_AUTOTUNE", "0")
    x = jnp.zeros((32,), jnp.float32)
    fn = autotune.choose("gated", {"a": _slow, "b": _fast}, (x,),
                         default="a")
    assert fn is _slow
    assert autotune.decisions() == {}


def test_stats_accounting():
    before = autotune.stats()
    x = jnp.zeros((32,), jnp.float32)
    autotune.choose("acct", {"a": _slow, "b": _fast}, (x,))  # miss: measures
    d1 = autotune.stats_delta(before)
    assert d1["measured"] == 1
    autotune.choose("acct", {"a": _slow, "b": _fast}, (x,))  # hit
    d2 = autotune.stats_delta(before)
    assert d2["measured"] == 1 and d2["hits"] == d1["hits"] + 1
