"""SQLite tensor / model checkpoints, wire-compatible with the reference
(lib/nnc/ccv_nnc_tensor_io.c:21/:126 and lib/nnc/ccv_cnnp_model_io.c).

Schema: ``tensors(name TEXT PRIMARY KEY, type INTEGER, format INTEGER,
datatype INTEGER, dim BLOB(int32[12]), data BLOB)``. The high 32 bits of
``type`` carry the encode identifier (0 = raw; the palettize identifiers are
handled in ccv_tpu.nn.palettize) and of ``datatype`` the qbits/reserved word.

Model checkpoints are rows named ``__<model>__[<tensor path>]`` like CNNP's
``ccv_cnnp_model_write`` (model_io.c:30); our writer uses
``__<model>__/<layer index>/<param name>`` paths, readable back by us and
inspectable by any sqlite client.
"""

from __future__ import annotations

import dataclasses
import os
import sqlite3
from typing import Callable, Dict, Optional, Tuple

import numpy as np

MAX_DIM = 12  # CCV_NNC_MAX_DIM_ALLOC (ccv_nnc_tfb.h:76)
FORMAT_NCHW = 0x01
FORMAT_NHWC = 0x02
FORMAT_CHWN = 0x04
CPU_MEMORY = 0x1

# ccv datatype tags (lib/ccv.h:45)
_DT = {"float32": 0x04000, "int32": 0x02000, "float64": 0x10000,
       "int64": 0x08000, "uint8": 0x01000, "float16": 0x20000,
       "bfloat16": 0x80000}
_DT_INV = {v: k for k, v in _DT.items()}


def _np_dtype(tag: int):
    import jax.numpy as jnp

    name = _DT_INV[tag & 0xFF000]
    return np.dtype(jnp.bfloat16) if name == "bfloat16" else np.dtype(name)


def open_db(path: str) -> sqlite3.Connection:
    conn = sqlite3.connect(path)
    conn.execute(
        "CREATE TABLE IF NOT EXISTS tensors "
        "(name TEXT, type INTEGER, format INTEGER, datatype INTEGER, "
        "dim BLOB, data BLOB, PRIMARY KEY (name))")
    return conn


@dataclasses.dataclass
class TensorIoOptions:
    """ccv_nnc_tensor_io_option_t twin (ccv_nnc.h:674-699): pluggable
    encode/decode hooks on tensor rows for encryption / compression /
    external storage (ccv_nnc_tensor_io.c:55/:221 call shapes).

    encode(name, data: bytes, datatype: int, shape) ->
        (encoded: bytes, identifier: int) or None to store raw.
    decode(name, data: bytes, datatype: int, shape, identifier: int) ->
        np.ndarray or None to fall through to the raw/palettize readers.
    Like the reference, identifier 0 means "unencoded" and rides in the
    high 32 bits of the `type` column (tensor_io.c:113/:151).
    """

    encode: Optional[Callable] = None
    decode: Optional[Callable] = None


def tensor_write(conn: sqlite3.Connection, name: str, arr,
                 format: int = FORMAT_NHWC,
                 options: Optional[TensorIoOptions] = None) -> None:
    """ccv_nnc_tensor_write twin."""
    arr = np.ascontiguousarray(arr)
    dtype_name = str(arr.dtype)
    tag = _DT[dtype_name]
    dim = np.zeros(MAX_DIM, np.int32)
    dim[:arr.ndim] = arr.shape
    data = arr.tobytes()
    type_ = CPU_MEMORY
    if options is not None and options.encode is not None:
        enc = options.encode(name, data, tag, arr.shape)
        if enc is not None:
            data, identifier = enc
            type_ = CPU_MEMORY | (int(identifier) << 32)
    conn.execute(
        "REPLACE INTO tensors (name, type, format, datatype, dim, data) "
        "VALUES (?, ?, ?, ?, ?, ?)",
        (name, type_, format, tag, dim.tobytes(), data))


def tensor_read(conn: sqlite3.Connection, name: str,
                options: Optional[TensorIoOptions] = None) -> np.ndarray:
    """ccv_nnc_tensor_read twin (raw, palettized, or hook-decoded rows)."""
    row = conn.execute(
        "SELECT type, format, datatype, dim, data FROM tensors WHERE name=?",
        (name,)).fetchone()
    if row is None:
        raise KeyError(name)
    type_, fmt, datatype, dim_blob, data = row
    identifier = (type_ >> 32) & 0xFFFFFFFF
    dim = np.frombuffer(dim_blob, np.int32)
    shape = tuple(int(d) for d in dim if d > 0)
    if options is not None and options.decode is not None:
        out = options.decode(name, data, datatype & 0xFFFFFFFF, shape,
                             identifier)
        if out is not None:
            return out
    if identifier != 0:
        from ccv_tpu.nn import palettize

        return palettize.decode(data, datatype & 0xFFFFFFFF, shape, identifier)
    dt = _np_dtype(datatype & 0xFFFFFFFF)
    return np.frombuffer(bytearray(data), dtype=dt).reshape(shape)


def tensor_new_from_file(path: str, datatype, shape,
                         offset: int = 0) -> np.ndarray:
    """ccv_nnc_tensor_new_from_file twin (ccv_nnc.h:587): zero-copy mmap
    of a raw tensor file. `datatype` is a numpy dtype or a ccv tag int.
    The returned array is a read-only view over the page cache; device_put
    streams straight from it (no host-side copy for big-model loads)."""
    dt = _np_dtype(datatype) if isinstance(datatype, int) else np.dtype(datatype)
    return np.memmap(path, dtype=dt, mode="r", offset=offset,
                     shape=tuple(shape))


EXTERNAL_STORE_ID = 0x8a0e5    # our own identifier tag for side-file rows


class ExternalStore:
    """External-store hook pair (the reference's motivating use of the
    encode/decode options): tensor payloads live in a side .bin file and
    the SQLite row carries only (offset, size). Reads are zero-copy
    np.memmap views — the mmap-loading path for big checkpoints.

        store = ExternalStore(path + '.bin')
        tensor_write(conn, name, arr, options=store.options())
        arr = tensor_read(conn, name, options=store.options())
    """

    def __init__(self, path: str):
        self.path = path

    def options(self) -> TensorIoOptions:
        return TensorIoOptions(encode=self._encode, decode=self._decode)

    def _encode(self, name, data: bytes, tag, shape) -> Tuple[bytes, int]:
        mode = "r+b" if os.path.exists(self.path) else "wb"
        with open(self.path, mode) as f:
            f.seek(0, os.SEEK_END)
            off = f.tell()
            f.write(data)
        return (np.array([off, len(data)], np.int64).tobytes(),
                EXTERNAL_STORE_ID)

    def _decode(self, name, data: bytes, tag, shape, identifier):
        if identifier != EXTERNAL_STORE_ID:
            return None
        off, size = np.frombuffer(data, np.int64)
        dt = _np_dtype(tag)
        mm = np.memmap(self.path, dtype=dt, mode="r", offset=int(off),
                       shape=(int(size) // dt.itemsize,))
        return mm.reshape(shape)


def list_tensors(conn: sqlite3.Connection):
    return [r[0] for r in conn.execute("SELECT name FROM tensors ORDER BY name")]


# -- model checkpoints -------------------------------------------------------

def _flatten_params(model) -> Dict[str, np.ndarray]:
    out = {}
    for i, (layer, p) in enumerate(zip(model.layers, model.params)):
        for k, v in p.items():
            out[f"/{i}/{layer.name}/{k}"] = np.asarray(v)
    for i, (layer, s) in enumerate(zip(model.layers, model.state)):
        for k, v in s.items():
            out[f"/{i}/{layer.name}/state/{k}"] = np.asarray(v)
    return out


def write_model(model, path: str, name: str) -> None:
    conn = open_db(path)
    with conn:
        for key, arr in _flatten_params(model).items():
            tensor_write(conn, f"__{name}__{key}", arr)
    conn.close()


def read_model(model, path: str, name: str) -> None:
    import jax.numpy as jnp

    conn = sqlite3.connect(path)
    prefix = f"__{name}__"
    for i, layer in enumerate(model.layers):
        for k in list(model.params[i].keys()):
            arr = tensor_read(conn, f"{prefix}/{i}/{layer.name}/{k}")
            model.params[i][k] = jnp.asarray(
                arr.reshape(model.params[i][k].shape))
        for k in list(model.state[i].keys()):
            try:
                arr = tensor_read(conn, f"{prefix}/{i}/{layer.name}/state/{k}")
                model.state[i][k] = jnp.asarray(arr)
            except KeyError:
                pass
    conn.close()
