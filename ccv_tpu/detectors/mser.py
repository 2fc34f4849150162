"""MSER: maximally stable extremal regions (reference: lib/ccv_mser.c).

ccv_mser dispatch twin (ccv_mser.c:852): single-channel integer input
runs the set-union component-tree MSER; multi-channel / float input runs
MSCR (the chi-distance color variant).

The component tree is inherently sequential (gray-level sweep over a
union-find), so it lives in the native runtime
(native/ccv_tpu_mser.cpp, C++ via ctypes) — milliseconds per VGA frame
instead of the round-1 pure-Python loop's seconds. Parity is window-exact
vs the reference (tests/test_mser.py).
"""

from __future__ import annotations

import ctypes
import dataclasses
from typing import List, Optional, Tuple

import numpy as np

DARK_TO_BRIGHT = 1
BRIGHT_TO_DARK = -1


@dataclasses.dataclass
class MserParams:
    """ccv_mser_param_t twin."""

    # MSER
    delta: int = 5
    min_area: int = 60
    max_area: int = 1 << 28
    max_variance: float = 0.25
    min_diversity: float = 0.2
    direction: int = DARK_TO_BRIGHT
    range: int = 255
    # MSCR (defaults from the msermatch tool, bin/msermatch.c:20-30)
    night: int = 0
    area_threshold: float = 1.01
    min_margin: float = 3e-3
    max_evolution: int = 200
    edge_blur_sigma: float = 1.0


@dataclasses.dataclass
class MserKeypoint:
    x: int
    y: int
    width: int
    height: int
    size: int
    keypoint: tuple


def _native():
    from ccv_tpu.core import native

    lib = native.load()
    if lib is None:
        raise RuntimeError("native runtime not built (make -C native)")
    if not hasattr(lib.ccv_tpu_mser, "_configured"):
        lib.ccv_tpu_mser.restype = ctypes.c_int
        lib.ccv_tpu_mser.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.ccv_tpu_mser._configured = True
    return lib


def mser(a, h=None, params: Optional[MserParams] = None
         ) -> Tuple[List[MserKeypoint], np.ndarray]:
    """ccv_mser twin for single-channel 8U input (set-union path).

    Returns (keypoints, label_map int32) where label_map assigns 1-based
    region ids to pixels of stable regions (first writer wins), exactly
    like the reference's `b` output.
    """
    params = params or MserParams()
    img = np.ascontiguousarray(np.asarray(a), np.uint8)
    if img.ndim == 3:
        img = np.ascontiguousarray(img[..., 0])
    if img.ndim != 2:
        raise ValueError(img.shape)
    if h is not None:
        h = np.ascontiguousarray(np.asarray(h), np.uint8)
        assert h.shape == img.shape
    rows, cols = img.shape
    lib = _native()
    labels = np.zeros((rows, cols), np.int32)
    cap = 8192
    kp = np.zeros((cap, 8), np.int32)
    count = lib.ccv_tpu_mser(
        img.ctypes.data_as(ctypes.c_void_p), rows, cols,
        h.ctypes.data_as(ctypes.c_void_p) if h is not None else None,
        params.delta, params.min_area, params.max_area,
        params.max_variance, params.min_diversity,
        params.direction, params.range,
        labels.ctypes.data_as(ctypes.c_void_p),
        kp.ctypes.data_as(ctypes.c_void_p), cap)
    out = []
    for i in range(min(count, cap)):
        size, x, y, rx, ry, rw, rh, _ = kp[i]
        out.append(MserKeypoint(x=int(rx), y=int(ry), width=int(rw),
                                height=int(rh), size=int(size),
                                keypoint=(int(x), int(y))))
    return out, labels


# ---------------------------------------------------------------------------
# MSCR — the color / float variant (_ccv_mscr, lib/ccv_mser.c:570)
# ---------------------------------------------------------------------------

def _chi_maps(a: np.ndarray, sigma: float):
    """Chi-distance edge maps in 4 directions + Gaussian blur
    (_ccv_mscr_chi, ccv_mser.c:449), computed on device."""
    import jax.numpy as jnp

    from ccv_tpu.ops import basic

    x = jnp.asarray(a, jnp.float32)
    if x.ndim == 2:
        x = x[..., None]

    def chi(p, q, diag):
        v = jnp.sum((q - p) ** 2 / (p + q + 1e-10), axis=-1)
        return jnp.sqrt(v * 0.5 if diag else v)

    dx = chi(x[:, :-1], x[:, 1:], False)
    dy = chi(x[:-1, :], x[1:, :], False)
    dxy = chi(x[:-1, :-1], x[1:, 1:], True)
    dxy2 = chi(x[:-1, 1:], x[1:, :-1], True)
    out = []
    for m in (dx, dy, dxy, dxy2):
        out.append(np.ascontiguousarray(
            np.asarray(basic.blur(m, sigma, out_float=True)), np.float32))
    return out


def _chitab3(size: int = 400) -> np.ndarray:
    """The chi-square threshold schedule: chi2inv(i/(size-1), 3)/3 with the
    last entry clamped (the closed form behind the reference's constant
    table, ccv_mser.c:348 — verified entry-for-entry)."""
    from scipy import stats

    p = np.arange(size) / (size - 1)
    tab = stats.chi2.ppf(p, 3) / 3.0
    tab[-1] = 133.333
    return tab.astype(np.float64)


def mscr(a, params: Optional[MserParams] = None
         ) -> Tuple[List[MserKeypoint], np.ndarray]:
    """_ccv_mscr twin for color / float input: chi-distance edge evolution
    under the chi-square schedule; stable areas by margin."""
    params = params or MserParams()
    img = np.asarray(a)
    if img.ndim == 2:
        img = img[..., None]
    rows, cols = img.shape[:2]
    bdx, bdy, bdxy, bdxy2 = _chi_maps(img, params.edge_blur_sigma)
    tab = _chitab3()
    lib = _native()
    if not hasattr(lib.ccv_tpu_mscr, "_configured"):
        lib.ccv_tpu_mscr.restype = ctypes.c_int
        lib.ccv_tpu_mscr.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.ccv_tpu_mscr._configured = True
    labels = np.zeros((rows, cols), np.int32)
    cap = 8192
    kp = np.zeros((cap, 8), np.int32)
    count = lib.ccv_tpu_mscr(
        bdx.ctypes.data_as(ctypes.c_void_p),
        bdy.ctypes.data_as(ctypes.c_void_p),
        bdxy.ctypes.data_as(ctypes.c_void_p),
        bdxy2.ctypes.data_as(ctypes.c_void_p),
        rows, cols,
        tab.ctypes.data_as(ctypes.c_void_p), len(tab),
        params.max_evolution, params.area_threshold, params.min_margin,
        params.min_area, params.max_area, params.min_diversity,
        labels.ctypes.data_as(ctypes.c_void_p),
        kp.ctypes.data_as(ctypes.c_void_p), cap)
    out = []
    for i in range(min(count, cap)):
        size, x, y, rx, ry, rw, rh, _seq = kp[i]
        out.append(MserKeypoint(x=int(rx), y=int(ry), width=int(rw),
                                height=int(rh), size=int(size),
                                keypoint=(int(x), int(y))))
    return out, labels


def mser_any(a, h=None, params: Optional[MserParams] = None):
    """ccv_mser dispatch twin (ccv_mser.c:852): multi-channel or float
    input runs MSCR; single-channel integer runs set-union MSER."""
    arr = np.asarray(a)
    color = (arr.ndim == 3 and arr.shape[-1] > 1) or \
        np.issubdtype(arr.dtype, np.floating)
    if color:
        return mscr(arr, params)
    return mser(arr, h=h, params=params)
