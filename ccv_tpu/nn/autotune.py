"""Per-shape measured kernel selection — the TPU analog of
``ccv_nnc_cmd_autotune`` (reference: lib/nnc/ccv_nnc_cmd.c:344-577).

The reference benchmarks every registered backend x algorithm for a
command on the actual tensors (two trial runs each, keeps the fastest,
``ccv_nnc_cmd_mono_time`` around ``ccv_nnc_cmd_exec``) and returns the
winning cmd. Here the "backends" are alternative XLA/Pallas formulations
of the same op; the measurement is a jitted wall-clock timing on the
current device, and the winner is persisted keyed by

    (op, device kind, arg shapes/dtypes, extra static config)

so later processes — including traced/jitted callers that cannot run a
measurement — reuse the decision. Inside ``jax.jit`` the args are
tracers: shapes and dtypes are still concrete, so cache *lookups* work
mid-trace; only a cache *miss* under tracing falls back to `default`
(measurement needs real arrays).

Usage::

    fn = autotune.choose("sdpa", {"pallas": flash, "xla": sdpa},
                         (q, k, v), default="pallas")
    out = fn(q, k, v)

or eagerly pre-tune with synthetic args (the ``cmd_autotune``-at-
schedule-time pattern)::

    autotune.measure("sdpa", variants, lambda: (q, k, v))
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

__all__ = ["choose", "measure", "cache_path", "clear", "decisions",
           "stats", "stats_delta"]

_LOCK = threading.RLock()
_MEM: Optional[Dict[str, Any]] = None  # loaded JSON cache
_TRIALS = 2  # cmd.c:492 measures each backend/algorithm twice
_WARMUP = 1

# per-process decision accounting (hits = persisted winner reused,
# measured = live re-measurement ran). bench.py surfaces these per config
# so a silent decision change (the round-4 SCD regression vector) shows up
# in the bench line instead of going unnoticed.
_STATS = {"hits": 0, "measured": 0}


def stats() -> Dict[str, int]:
    """Snapshot of this process's decision counters."""
    with _LOCK:
        return dict(_STATS)


def stats_delta(before: Dict[str, int]) -> Dict[str, int]:
    now = stats()
    return {k: now[k] - before.get(k, 0) for k in now}


def cache_path() -> str:
    """Location of the persisted decisions (JSON)."""
    env = os.environ.get("CCV_TPU_AUTOTUNE_CACHE")
    if env:
        return env
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "ccv_tpu", "autotune.json")


def _load() -> Dict[str, Any]:
    global _MEM
    with _LOCK:
        if _MEM is None:
            try:
                with open(cache_path()) as f:
                    _MEM = json.load(f)
            except (OSError, ValueError):
                _MEM = {}
        return _MEM


def _save() -> None:
    with _LOCK:
        path = cache_path()
        try:
            # merge-on-save: another process (e.g. a CPU test run sharing
            # the cache with a TPU bench) may have persisted decisions for
            # OTHER keys since we loaded; re-read and overlay ours so a
            # whole-file dump can't clobber them (keys embed the device
            # kind, so cross-backend keys never collide)
            merged: Dict[str, Any] = {}
            try:
                with open(path) as f:
                    merged = json.load(f)
            except (OSError, ValueError):
                pass
            merged.update(_MEM or {})
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(merged, f, indent=1, sort_keys=True)
            os.replace(tmp, path)
        except OSError:
            pass  # read-only filesystem: keep the in-memory decision


def clear() -> None:
    """Drop all decisions (in memory and on disk)."""
    global _MEM
    with _LOCK:
        _MEM = {}
        try:
            os.remove(cache_path())
        except OSError:
            pass


def decisions() -> Dict[str, Any]:
    """A copy of the current decision table (introspection twin of the
    reference's CCV_CLI_INFO autotune prints, cmd.c:564-571)."""
    return dict(_load())


def _is_concrete(x: Any) -> bool:
    import jax.core

    return not isinstance(x, jax.core.Tracer)


def _sig_of(x: Any) -> str:
    shape = getattr(x, "shape", None)
    dtype = getattr(x, "dtype", None)
    if shape is None:
        return repr(x)
    return f"{dtype}{list(shape)}"


def _key(op: str, args: Sequence[Any], extra: str) -> str:
    import jax

    dev = jax.devices()[0].device_kind
    sig = ",".join(_sig_of(a) for a in args)
    return f"{op}|{dev}|{sig}|{extra}"


_PIPELINE = 8  # dispatches per timed trial (amortizes the device RTT)


def _time_variant(fn: Callable, args: Tuple) -> float:
    """Best per-call wall-clock of `fn(*args)` with a warmup run (the
    analog of ccv_nnc_cmd_mono_time bracketing, cmd.c:489-497).

    Each trial dispatches the program _PIPELINE times back-to-back before
    blocking: over a tunneled device a single block_until_ready costs a
    ~25 ms round trip, which would swamp the variants' real (sub-ms)
    differences; pipelined dispatch measures device throughput — the same
    way the detectors' async paths use the winner."""
    import jax

    # pre-jitted variants are measured as-is so the measured compilation
    # IS the production one (callers cache the returned winner)
    jfn = fn if hasattr(fn, "lower") else jax.jit(fn)
    best = float("inf")
    try:
        for i in range(_WARMUP + _TRIALS):
            t0 = time.perf_counter()
            out = None
            for _ in range(_PIPELINE if i >= _WARMUP else 1):
                out = jfn(*args)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            if i >= _WARMUP:
                best = min(best, dt / _PIPELINE)
    except Exception:
        return float("inf")  # a variant that can't run never wins
    return best


def measure(op: str, variants: Dict[str, Callable], make_args: Callable,
            extra: str = "") -> str:
    """Benchmark every variant on ``make_args()`` output, persist and
    return the winner's name."""
    args = tuple(make_args())
    timings = {name: _time_variant(fn, args)
               for name, fn in variants.items()}
    winner = min(timings, key=timings.get)
    cache = _load()
    with _LOCK:
        _STATS["measured"] += 1
        cache[_key(op, args, extra)] = {
            "choice": winner,
            "ms": {k: (round(v * 1e3, 4) if v != float("inf") else None)
                   for k, v in timings.items()},
        }
        _save()
    return winner


def recorded(op: str, args: Sequence[Any], extra: str = "") -> Optional[str]:
    """The persisted winner's name for this (op, shapes, extra) key, or
    None if it was never measured. Lets callers reuse a measured decision
    for a structurally-identical variant family (e.g. the batched form of
    an already-tuned single-image program) without re-measuring."""
    hit = _load().get(_key(op, args, extra))
    return hit.get("choice") if hit else None


def choose(op: str, variants: Dict[str, Callable], args: Sequence[Any],
           default: Optional[str] = None, extra: str = "") -> Callable:
    """Return the measured-fastest variant for these arg shapes.

    Cache hit: returns the recorded winner (works under tracing — the
    key only needs shapes/dtypes). Cache miss with concrete args:
    measures now, persists, returns the winner. Cache miss under
    tracing: returns `default` (first variant if unset) without
    recording, mirroring the reference's behavior of running the
    existing cmd when autotune was never called.
    """
    if default is None:
        default = next(iter(variants))
    if len(variants) == 1:
        return variants[default]
    key = _key(op, args, extra)
    hit = _load().get(key)
    if hit is not None and hit.get("choice") in variants:
        with _LOCK:
            _STATS["hits"] += 1
        return variants[hit["choice"]]
    if not all(_is_concrete(a) for a in args):
        return variants[default]
    if os.environ.get("CCV_TPU_AUTOTUNE", "1") == "0":
        return variants[default]
    winner = measure(op, variants, lambda: args, extra=extra)
    return variants[winner]
