"""ctypes bindings for the native runtime (native/ccv_tpu_native.cpp).

Provides siphash-2-4 signatures, the byte-bounded LRU blob cache, and
libpng/libjpeg decoders. Everything degrades gracefully: if the shared
library isn't built, callers fall back to pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.environ.get(
    "CCV_TPU_NATIVE_LIB",
    os.path.join(os.path.dirname(__file__), "..", "native",
                 "libccv_tpu_native.so"))
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    makefile_dir = os.path.dirname(os.path.abspath(_LIB_PATH))
    try:
        subprocess.run(["make", "-C", makefile_dir], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    from ccv_tpu.utils import flags as _flags

    if _flags.is_set(_flags.DISABLE_NATIVE_RUNTIME):
        return None
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
    lib.ccv_tpu_siphash24.restype = ctypes.c_uint64
    lib.ccv_tpu_siphash24.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                      ctypes.c_char_p]
    lib.ccv_tpu_cache_new.restype = ctypes.c_void_p
    lib.ccv_tpu_cache_new.argtypes = [ctypes.c_size_t]
    lib.ccv_tpu_cache_put.restype = ctypes.c_int
    lib.ccv_tpu_cache_put.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                      ctypes.c_char_p, ctypes.c_size_t]
    lib.ccv_tpu_cache_get.restype = ctypes.c_size_t
    lib.ccv_tpu_cache_get.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                      ctypes.c_void_p, ctypes.c_size_t]
    lib.ccv_tpu_cache_delete.restype = ctypes.c_int
    lib.ccv_tpu_cache_delete.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.ccv_tpu_cache_drain.argtypes = [ctypes.c_void_p]
    lib.ccv_tpu_cache_size.restype = ctypes.c_size_t
    lib.ccv_tpu_cache_size.argtypes = [ctypes.c_void_p]
    lib.ccv_tpu_cache_free.argtypes = [ctypes.c_void_p]
    lib.ccv_tpu_free.argtypes = [ctypes.c_void_p]
    for name in ("ccv_tpu_decode_png", "ccv_tpu_decode_jpeg"):
        if hasattr(lib, name):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_char_p,
                           ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                           ctypes.POINTER(ctypes.c_int),
                           ctypes.POINTER(ctypes.c_int),
                           ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


_SIP_KEY = b"ccv_tpu_sipkey00"  # 16 bytes


def siphash24(data: bytes) -> Optional[int]:
    lib = load()
    if lib is None:
        return None
    return int(lib.ccv_tpu_siphash24(data, len(data), _SIP_KEY))


class NativeLru:
    """Byte-bounded LRU of blobs keyed by 64-bit signature."""

    def __init__(self, budget: int):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._handle = self._lib.ccv_tpu_cache_new(budget)

    def put(self, sig: int, data: bytes) -> bool:
        return self._lib.ccv_tpu_cache_put(self._handle, sig, data, len(data)) == 0

    def get(self, sig: int) -> Optional[bytes]:
        size = self._lib.ccv_tpu_cache_get(self._handle, sig, None, 0)
        if size == 0:
            return None
        buf = ctypes.create_string_buffer(size)
        self._lib.ccv_tpu_cache_get(self._handle, sig, buf, size)
        return buf.raw

    def delete(self, sig: int) -> bool:
        return self._lib.ccv_tpu_cache_delete(self._handle, sig) == 0

    def drain(self) -> None:
        self._lib.ccv_tpu_cache_drain(self._handle)

    @property
    def used_bytes(self) -> int:
        return int(self._lib.ccv_tpu_cache_size(self._handle))

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.ccv_tpu_cache_free(self._handle)
            self._handle = None


def decode_image(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Decode PNG/JPEG through the native decoders. Returns (array, ch)."""
    lib = load()
    if lib is None:
        return None
    lower = path.lower()
    if lower.endswith(".png") and hasattr(lib, "ccv_tpu_decode_png"):
        fn = lib.ccv_tpu_decode_png
    elif lower.endswith((".jpg", ".jpeg")) and hasattr(lib, "ccv_tpu_decode_jpeg"):
        fn = lib.ccv_tpu_decode_jpeg
    else:
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    rows = ctypes.c_int()
    cols = ctypes.c_int()
    ch = ctypes.c_int()
    if fn(path.encode(), ctypes.byref(out), ctypes.byref(rows),
          ctypes.byref(cols), ctypes.byref(ch)) != 0:
        return None
    n = rows.value * cols.value * ch.value
    arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    lib.ccv_tpu_free(out)
    shape = (rows.value, cols.value) if ch.value == 1 else (
        rows.value, cols.value, ch.value)
    return arr.reshape(shape), ch.value
