"""Test config: force CPU with 8 virtual devices so sharding/collective tests
run without TPU hardware (bench runs on the real chip via bench.py).

`pytest --tpu` flips to the REAL-CHIP fidelity tier: the platform is left
at the session default (the TPU), and only tests marked ``@pytest.mark.tpu``
run — the window-parity and golden-image gates whose numbers must hold on
the accelerated backend too (round-2 lesson: the bf16 MXU box-sum noise
broke SCD detections on the chip while every CPU-tier gate stayed green)."""

import os
import sys

TPU_TIER = "--tpu" in sys.argv

if not TPU_TIER:
    # force CPU even when the session exports JAX_PLATFORMS=axon (real TPU).
    # jax may already be imported by a pytest plugin, so set the config
    # directly (it works pre-backend-initialization) plus the env vars.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # the CPU tier checks NUMERICS, not speed: backend optimization level 0
    # cuts cold-compile wall time ~4.5x (test_scd_batch 318 s -> 71 s) with
    # identical results
    if "xla_backend_optimization_level" not in flags:
        flags = (flags + " --xla_backend_optimization_level=0").strip()
    os.environ["XLA_FLAGS"] = flags

import jax

if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()

# persistent compile cache: this box has ONE core and the fidelity suite is
# dominated by XLA CPU compiles — cache them across pytest runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest

REFERENCE = os.environ.get("CCV_TPU_REFERENCE", "/root/reference")


def reference_path(rel: str) -> str:
    return os.path.join(REFERENCE, rel)


def has_reference() -> bool:
    # a directory that exists but lacks the samples is NOT a usable
    # checkout (CI may export CCV_TPU_REFERENCE at a stub path)
    return os.path.isfile(os.path.join(REFERENCE, "samples", "chessbox.png"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference checkout not available"
)


def read_golden(name: str):
    """Load a golden CCVBINDM matrix from the reference's unit-test data."""
    from ccv_tpu.core.io import read

    return read(reference_path(f"test/unit/data/{name}")).numpy()


def assert_image_close(actual, golden, atol=1, frac=0.999, msg=""):
    """Fidelity gate: >= `frac` of entries within `atol`, and no wild outliers.

    The reference's tests are bit-exact C-vs-golden; we compute in XLA (often
    float) so the gate is tolerance-based, mirroring
    REQUIRE_ARRAY_EQ_WITHIN_ANGLE_AND_MAGNITUDE's spirit.
    """
    actual = np.asarray(actual)
    golden = np.asarray(golden)
    assert actual.shape == golden.shape, f"{msg}: shape {actual.shape} != {golden.shape}"
    a = actual.astype(np.float64)
    g = golden.astype(np.float64)
    ok = np.abs(a - g) <= atol
    frac_ok = ok.mean()
    assert frac_ok >= frac, (
        f"{msg}: only {frac_ok:.4%} within +/-{atol} "
        f"(max err {np.abs(a - g).max()}, mean err {np.abs(a - g).mean():.4f})"
    )


# persistent XLA compile cache: the fidelity suite's cost is dominated by
# CPU compiles of the per-level detector programs; warm reruns are fast
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_addoption(parser):
    parser.addoption("--slow", action="store_true", default=False,
                     help="run the slow end-to-end fidelity tier as well")
    parser.addoption("--tpu", action="store_true", default=False,
                     help="real-chip tier: run only @pytest.mark.tpu gates "
                          "on the session's accelerator backend")


_module_uses_reference: dict = {}


def _uses_reference(path: str) -> bool:
    """Does this test module read from the reference checkout?

    Many fidelity tests hardcode /root/reference sample/golden paths; on a
    machine without the checkout (e.g. a CI runner) every such test must
    skip, not error. Detect usage by source scan so new tests are covered
    automatically without per-test markers.
    """
    cached = _module_uses_reference.get(path)
    if cached is None:
        try:
            with open(path, "r") as f:
                src = f.read()
        except OSError:
            src = ""
        cached = ("/root/reference" in src or "reference_path(" in src
                  or "read_golden(" in src or "REFERENCE" in src)
        _module_uses_reference[path] = cached
    return cached


def pytest_collection_modifyitems(config, items):
    if not has_reference():
        skip_ref = pytest.mark.skip(reason="reference checkout not available")
        for item in items:
            if _uses_reference(str(item.fspath)):
                item.add_marker(skip_ref)
    if config.getoption("--tpu"):
        # real-chip tier: ONLY the tpu-marked fidelity gates (the rest of
        # the suite assumes the 8-virtual-device CPU mesh)
        skip_non_tpu = pytest.mark.skip(reason="not part of the --tpu tier")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip_non_tpu)
        return
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
