"""Transparent content-addressed memoization cache.

Behavioral twin of ccv's application-wide cache (reference: lib/ccv_cache.c,
lib/ccv_memory.c:16-30,169-190,293): every cached op derives its output
signature from (op-name+params, input signatures) and returns the cached
result if present — so repeated pipelines (e.g. a detector recomputing the
same pyramid level) skip work entirely.

TPU-native redesign: instead of intercepting free/alloc, we memoize at the op
boundary. Values cached are device arrays (``jax.Array`` stays in HBM, so a
hit avoids both compute *and* transfers). The cache is size-bounded LRU, like
``ccv_enable_cache(size)``. Signatures are 64-bit blake2b (stand-in for the
reference's siphash-2-4, lib/3rdparty/siphash).
"""

from __future__ import annotations

import functools
import hashlib
import threading
from collections import OrderedDict
from typing import Any, Callable, Optional

_lock = threading.RLock()
_enabled = False
_max_bytes = 0
_cur_bytes = 0
_store: "OrderedDict[tuple, Any]" = OrderedDict()
# stats
hits = 0
misses = 0


def _native_siphash():
    try:
        from ccv_tpu.core import native

        if native.load() is not None:
            return native.siphash24
    except Exception:
        pass
    return None


_siphash = _native_siphash()


def generate_signature(data: bytes, *extra) -> int:
    """64-bit content signature (ccv_cache_generate_signature twin).

    Uses the native siphash-2-4 (native/ccv_tpu_native.cpp) when built,
    falling back to truncated blake2b."""
    if extra:
        data = data + b"|" + repr(extra).encode()
    if _siphash is not None:
        sig = _siphash(data)
    else:
        h = hashlib.blake2b(data, digest_size=8)
        sig = int.from_bytes(h.digest(), "little")
    return sig or 1  # 0 is the "no signature" sentinel


def derive_signature(op_name: str, params: tuple, input_sigs: tuple) -> int:
    """ccv_declare_derived_signature twin: sig(op, params, input sigs)."""
    if any(s == 0 for s in input_sigs):
        return 0
    return generate_signature(op_name.encode(), params, input_sigs)


def enable(max_bytes: int = 256 << 20) -> None:
    """ccv_enable_cache twin."""
    global _enabled, _max_bytes
    with _lock:
        _enabled = True
        _max_bytes = max_bytes


def disable() -> None:
    """ccv_disable_cache twin: drop everything."""
    global _enabled, _cur_bytes
    with _lock:
        _enabled = False
        _store.clear()
        _cur_bytes = 0


def drain() -> None:
    """ccv_drain_cache twin: drop contents, stay enabled."""
    global _cur_bytes
    with _lock:
        _store.clear()
        _cur_bytes = 0


def is_enabled() -> bool:
    return _enabled


def _nbytes(value: Any) -> int:
    total = 0
    for leaf in _leaves(value):
        total += getattr(leaf, "nbytes", 64)
    return total


def _leaves(value):
    import jax
    return jax.tree_util.tree_leaves(value)


def get(sig: int) -> Optional[Any]:
    global hits, misses
    if not _enabled or sig == 0:
        return None
    with _lock:
        if sig in _store:
            _store.move_to_end(sig)
            hits += 1
            return _store[sig]
        misses += 1
        return None


def put(sig: int, value: Any) -> None:
    global _cur_bytes
    if not _enabled or sig == 0:
        return
    with _lock:
        size = _nbytes(value)
        if size > _max_bytes:
            return
        if sig in _store:
            _store.move_to_end(sig)
            return
        _store[sig] = value
        _cur_bytes += size
        while _cur_bytes > _max_bytes and _store:
            _, old = _store.popitem(last=False)
            _cur_bytes -= _nbytes(old)


def cached_op(fmt: str, n_outputs: int = 1) -> Callable:
    """Decorator for DenseMatrix-level ops with ccv memoization semantics.

    ``fmt`` is the op identity string (e.g. ``"ccv_sobel"``). The wrapped
    function receives (arrays..., **params) and returns array(s); the wrapper
    handles DenseMatrix unwrap, signature derivation, cache lookup/insert.
    """
    from ccv_tpu.core.dense_matrix import DenseMatrix, as_array

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*mats, **params):
            arrays = [as_array(m) for m in mats]
            sigs = tuple(m.sig if isinstance(m, DenseMatrix) else 0 for m in mats)
            pkey = tuple(sorted(params.items()))
            out_sigs = tuple(
                derive_signature(f"{fmt}#{i}", pkey, sigs) for i in range(n_outputs)
            )
            if all(s != 0 for s in out_sigs):
                cached = [get(s) for s in out_sigs]
                if all(c is not None for c in cached):
                    outs = [DenseMatrix(c, sig=s) for c, s in zip(cached, out_sigs)]
                    return outs[0] if n_outputs == 1 else tuple(outs)
            result = fn(*arrays, **params)
            results = (result,) if n_outputs == 1 else tuple(result)
            outs = []
            for r, s in zip(results, out_sigs):
                put(s, r)
                outs.append(DenseMatrix(r, sig=s))
            return outs[0] if n_outputs == 1 else tuple(outs)

        wrapper.raw = fn  # direct access to the jax-level function
        return wrapper

    return deco
