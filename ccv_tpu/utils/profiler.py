"""Profiling hooks (reference: ccv_nnc_set_profiler proxies
cudaProfilerStart/Stop, lib/nnc/ccv_nnc.h:883; ccv_nnc_cmd_mono_time :735).

TPU twin: toggles the jax profiler (xprof traces viewable in TensorBoard /
xprof) and provides the monotonic-clock helper autotuning used.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

_trace_dir: Optional[str] = None
_active = False


def set_profiler(state: int, trace_dir: str = "/tmp/ccv_tpu_trace") -> None:
    """ccv_nnc_set_profiler twin: 1 = start tracing, 0 = stop."""
    global _active, _trace_dir
    import jax

    if state and not _active:
        _trace_dir = trace_dir
        jax.profiler.start_trace(trace_dir)
        _active = True
    elif not state and _active:
        jax.profiler.stop_trace()
        _active = False


@contextlib.contextmanager
def trace(name: str):
    """Annotate a region (shows up in the xprof timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def mono_time() -> int:
    """ccv_nnc_cmd_mono_time twin: monotonic nanoseconds."""
    return time.monotonic_ns()
