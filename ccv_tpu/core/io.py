"""Image / matrix I/O (reference: lib/ccv_io.c + lib/io/*.inc).

Decoding happens at the host edge (PIL for PNG/JPEG/BMP), then the pixels are
``device_put`` to HBM as a DenseMatrix with a content signature. Also reads and
writes the reference's ``CCVBINDM`` binary matrix format so the golden files
under the reference's test/unit/data can gate our fidelity tests.

Grayscale conversion matches the reference bit-exactly:
``(r*6969 + g*23434 + b*2365) >> 15`` (lib/io/_ccv_io_libjpeg.inc:232).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from ccv_tpu.core.dense_matrix import (
    DenseMatrix,
    from_numpy,
    ccv_type_to_dtype,
    ccv_type_channels,
)

# io flags (lib/ccv.h:500-540)
IO_GRAY = 0x100
IO_RGB_COLOR = 0x300
IO_ANY_FILE = 0x022


def rgb_to_gray_u8(rgb: np.ndarray, libpng: bool = False) -> np.ndarray:
    """Bit-exact twin of the reference's fixed-point RGB->gray.

    The jpeg/bmp path truncates with 6969/23434/2365 (lib/io/_ccv_io_libjpeg
    .inc:232); the png path delegates to png_set_rgb_to_gray whose default
    Rec.709 coefficients are 6968/23434/2366 with rounding.
    """
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    if libpng:
        return ((r * 6968 + g * 23434 + b * 2366 + 16384) >> 15).astype(np.uint8)
    return ((r * 6969 + g * 23434 + b * 2365) >> 15).astype(np.uint8)


def _read_ccv_binary(path: str) -> DenseMatrix:
    with open(path, "rb") as f:
        magic = f.read(8)
        assert magic == b"CCVBINDM", f"{path}: not a CCVBINDM file"
        type_tag, rows, cols = struct.unpack("<iii", f.read(12))
        dt = ccv_type_to_dtype(type_tag)
        ch = ccv_type_channels(type_tag)
        # reference rows are stored with step = 4-byte aligned row stride
        step = (cols * ch * dt.itemsize + 3) & ~3
        raw = f.read(step * rows)
    buf = np.frombuffer(raw, dtype=np.uint8).reshape(rows, step)
    row_bytes = cols * ch * dt.itemsize
    arr = (
        buf[:, :row_bytes]
        .copy()
        .view(dt)
        .reshape(rows, cols, ch)
    )
    if ch == 1:
        arr = arr[..., 0]
    return from_numpy(arr)


def write_ccv_binary(m, path: str) -> None:
    arr = m.numpy() if isinstance(m, DenseMatrix) else np.asarray(m)
    if arr.ndim == 2:
        arr = arr[..., None]
    rows, cols, ch = arr.shape
    from ccv_tpu.core.dense_matrix import _DTYPE_TO_CCV  # noqa: internal map

    type_tag = _DTYPE_TO_CCV[np.dtype(arr.dtype).name] | ch
    row_bytes = cols * ch * arr.dtype.itemsize
    step = (row_bytes + 3) & ~3
    with open(path, "wb") as f:
        f.write(b"CCVBINDM")
        f.write(struct.pack("<iii", type_tag, rows, cols))
        pad = b"\x00" * (step - row_bytes)
        data = np.ascontiguousarray(arr)
        for i in range(rows):
            f.write(data[i].tobytes())
            if pad:
                f.write(pad)


def read(path: str, flags: int = 0) -> DenseMatrix:
    """ccv_read twin: decode an image (or CCVBINDM blob) into a DenseMatrix."""
    with open(path, "rb") as f:
        head = f.read(8)
    if head == b"CCVBINDM":
        return _read_ccv_binary(path)

    arr = None
    try:  # native libpng/libjpeg decoder (native/ccv_tpu_native.cpp)
        from ccv_tpu.core import native

        decoded = native.decode_image(path)
        if decoded is not None:
            arr = decoded[0]
    except Exception:
        arr = None
    if arr is None:
        from PIL import Image

        img = Image.open(path)
        if img.mode in ("P", "RGBA", "CMYK", "LA"):
            img = img.convert("RGB")
        arr = np.asarray(img)
    want_gray = (flags & IO_GRAY) == IO_GRAY and (flags & IO_RGB_COLOR) != IO_RGB_COLOR
    want_rgb = (flags & IO_RGB_COLOR) == IO_RGB_COLOR
    if arr.ndim == 3 and arr.shape[2] >= 3:
        arr = arr[..., :3]
        if want_gray:
            arr = rgb_to_gray_u8(arr, libpng=path.lower().endswith(".png"))
    elif arr.ndim == 2:
        if want_rgb:
            arr = np.stack([arr] * 3, axis=-1)
    return from_numpy(arr)


def write(m, path: str, format: Optional[str] = None) -> None:
    """ccv_write twin: PNG/JPEG via PIL, binary via CCVBINDM."""
    if (format or path).endswith((".bin", "binary")):
        write_ccv_binary(m, path)
        return
    from PIL import Image

    arr = m.numpy() if isinstance(m, DenseMatrix) else np.asarray(m)
    if arr.dtype != np.uint8:
        arr = np.clip(np.round(arr), 0, 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
