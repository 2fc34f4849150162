"""Ahead-of-time executable cache keyed by CALLER-stable strings.

The JAX persistent compile cache keys on a hash of the serialized HLO +
compile options. For the biggest SCD whole-octave program that key is
unstable across processes (byte-identical StableHLO text, different key
every run — measured in round 5), so a ~10-minute Mosaic/XLA compile
landed in every fresh process. This cache sidesteps the XLA key: the
caller provides a deterministic description (geometry + cascade
signature + form), we append the JAX version / platform / device kind,
and store the compiled PJRT executable via
jax.experimental.serialize_executable (the ccv analog: nnc's
ccv_nnc_cmd_autotune persists its winner table; here we persist the
binary itself).

Entries are (payload, in_tree, out_tree, fingerprint) pickles; a load
that fails for any reason (new jax, different chip, corrupt file) falls
back to compiling and overwrites the entry.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import threading
from typing import Any, Callable, Optional

_LOCK = threading.Lock()

# process-wide counters surfaced by bench.py next to the autotune
# hit/measure counts
STATS: dict = {}


def cache_dir() -> Optional[str]:
    base = os.environ.get("CCV_TPU_AOT_CACHE")
    if base is None:
        import jax
        tag = (os.environ.get("JAX_PLATFORM_NAME")
               or os.environ.get("JAX_PLATFORMS") or "default")
        if tag == "cpu":
            return None  # CPU tier: compiles are cheap, skip disk churn
        base = os.path.expanduser(f"~/.cache/ccv_tpu_jax/{tag}/aot")
    try:
        os.makedirs(base, exist_ok=True)
    except OSError:
        return None
    return base


def _fingerprint(key: str) -> str:
    import jax
    dev = jax.devices()[0]
    return (f"{key}|jax={jax.__version__}|plat={dev.platform}"
            f"|kind={getattr(dev, 'device_kind', '?')}")


def _entry_path(key: str):
    d = cache_dir()
    if not d:
        return None, None
    fp = _fingerprint(key)
    return (os.path.join(d, hashlib.sha256(fp.encode()).hexdigest()[:32]
                         + ".pjrt"), fp)


def entry_exists(key: str) -> bool:
    path, _ = _entry_path(key)
    return bool(path) and os.path.exists(path)


def load_or_compile(jitfn: Callable, args: tuple, key: str,
                    stats: Optional[dict] = None) -> Any:
    """Return a jax.stages.Compiled for `jitfn(*args)`, loading the
    serialized executable stored under `key` when present, else
    compiling (lower -> compile) and persisting it. `stats` (optional
    dict) gets 'aot_hits'/'aot_compiles' counters bumped — bench
    surfaces them the way autotune hit/measure counts are surfaced."""
    from jax.experimental import serialize_executable as _se

    path, fp = _entry_path(key)
    d = cache_dir()
    if path and os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree, stored_fp = pickle.load(f)
            if stored_fp == fp:
                import jax
                compiled = _se.deserialize_and_load(
                    payload, in_tree, out_tree,
                    # octave programs are single-device; pinning the
                    # execution devices keeps the load correct when the
                    # process runs a forced multi-device host platform
                    execution_devices=[jax.devices()[0]])
                if stats is not None:
                    stats["aot_hits"] = stats.get("aot_hits", 0) + 1
                return compiled
        except Exception:
            pass  # fall through to a fresh compile
    compiled = jitfn.lower(*args).compile()
    if stats is not None:
        stats["aot_compiles"] = stats.get("aot_compiles", 0) + 1
    if path:
        try:
            payload, in_tree, out_tree = _se.serialize(compiled)
            blob = pickle.dumps((payload, in_tree, out_tree, fp))
            with _LOCK:
                fd, tmp = tempfile.mkstemp(dir=d)
                with os.fdopen(fd, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)
        except Exception:
            pass  # cache is best-effort
    return compiled
