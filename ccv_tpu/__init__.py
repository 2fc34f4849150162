"""ccv_tpu — a TPU-native vision + neural-network framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of liuliu/ccv:

- ``ccv_tpu.core``      dense matrices over ``jax.Array``, content-hash memoization
                        cache, image / golden-file I/O, algebra and numeric helpers
                        (reference: lib/ccv_memory.c, lib/ccv_cache.c, lib/ccv_io.c).
- ``ccv_tpu.ops``       fused image-processing primitives (sobel, blur, resample,
                        color transforms, canny, SAT, pyramids) as batched XLA/Pallas
                        programs (reference: lib/ccv_basic.c, lib/ccv_resample.c, ...).
- ``ccv_tpu.detectors`` the classic detector suite (SIFT, SWT, SCD, BBF, ICF, DPM,
                        TLD, MSER, ferns, DAISY) re-expressed as batched vectorized
                        XLA programs (reference: lib/ccv_{sift,swt,scd,...}.c).
- ``ccv_tpu.nn``        the NNC-equivalent neural-network layer: functional op set,
                        Keras/CNNP-like model API, optimizers, dataframe pipeline,
                        SQLite-compatible checkpoints (reference: lib/nnc/).
- ``ccv_tpu.models``    model zoo (VGG-D / ccv_convnet twin, ...).
- ``ccv_tpu.parallel``  mesh/sharding utilities: the TPU-native equivalent of the
                        reference's NCCL data-parallel graph transform
                        (reference: lib/nnc/ccv_nnc_symbolic_graph_parallel.c).

Design: compute lives on plain ``jax.Array``s inside ``jit``; the ccv-compatible
surface (``DenseMatrix`` with signatures + transparent memoization) is a thin shell
at the host edge.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: detector pyramids compile one program per
# level shape; caching them on disk makes every process after the first fast.
import os as _os

import jax as _jax

_platform_tag = _os.environ.get("JAX_PLATFORM_NAME") or _os.environ.get("JAX_PLATFORMS") or "default"
_cache_dir = _os.environ.get("CCV_TPU_JAX_CACHE",
                             _os.path.expanduser(f"~/.cache/ccv_tpu_jax/{_platform_tag}"))
# only persist TPU compilations: XLA:CPU AOT results are pinned to exact host
# CPU features and spew mismatch warnings when reloaded.
if _platform_tag not in ("cpu",):
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

# Honor an explicit JAX_PLATFORMS=cpu (etc.) even when a site plugin
# re-registered accelerator backends with its own jax_platforms value at
# interpreter start (the tunneled-TPU sitecustomize does): the env var is
# JAX's documented contract, and CI / bin-tool smoke runs rely on it to
# stay off the accelerator. Accelerator selections are left to the plugin.
_env_platforms = _os.environ.get("JAX_PLATFORMS")
if _env_platforms and all(
        p.strip() in ("cpu",) for p in _env_platforms.split(",")):
    try:
        _jax.config.update("jax_platforms", _env_platforms)
    except Exception:  # pragma: no cover
        pass

from ccv_tpu.core.dense_matrix import DenseMatrix, from_numpy, to_numpy
from ccv_tpu.core import cache
from ccv_tpu.core.io import read, write

__all__ = [
    "DenseMatrix",
    "from_numpy",
    "to_numpy",
    "cache",
    "read",
    "write",
]
