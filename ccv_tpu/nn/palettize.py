"""Palette weight quantization (reference: lib/nnc/ccv_nnc_palettize.c:9).

Wire format per block of ``number_in_blocks`` elements: a palette of
2^qbits centroids in the source dtype (optimal 1-D k-means), followed by
bit-packed indices. qbits in {4, 5, 6, 7, 8}.

Encode runs on the host (numpy); decode ("depalettize") is a jnp.take LUT —
the TPU twin of the reference's CUDA/MPS depalettize kernels.
"""

from __future__ import annotations

import numpy as np

from ccv_tpu.core.numeric import kmeans1d

_DT_SIZE = {0x20000: 2, 0x04000: 4, 0x10000: 8}  # 16F, 32F, 64F
_DT_NP = {0x20000: np.float16, 0x04000: np.float32, 0x10000: np.float64}


def _pack_bits(indices: np.ndarray, qbits: int) -> np.ndarray:
    if qbits == 8:
        return indices.astype(np.uint8)
    if qbits == 4:
        n = len(indices)
        if n % 2:
            indices = np.concatenate([indices, [0]])
        pairs = indices.reshape(-1, 2).astype(np.uint8)
        return (pairs[:, 0] << 4) | pairs[:, 1]
    # 5/6/7 bits: pack groups of 8 indices into qbits bytes
    n = len(indices)
    pad = (-n) % 8
    idx = np.concatenate([indices, np.zeros(pad, indices.dtype)]).astype(np.uint64)
    groups = idx.reshape(-1, 8)
    acc = np.zeros(len(groups), np.object_)
    big = np.zeros(len(groups), dtype=np.uint64)
    for j in range(8):
        big = (big << np.uint64(qbits)) | groups[:, j]
    out = np.zeros((len(groups), qbits), np.uint8)
    for b in range(qbits):
        shift = np.uint64(8 * (qbits - 1 - b))
        out[:, b] = ((big >> shift) & np.uint64(0xFF)).astype(np.uint8)
    return out.reshape(-1)


def _unpack_bits(data: np.ndarray, qbits: int, n: int) -> np.ndarray:
    if qbits == 8:
        return data[:n].astype(np.int32)
    if qbits == 4:
        hi = (data >> 4).astype(np.int32)
        lo = (data & 0xF).astype(np.int32)
        out = np.empty(len(data) * 2, np.int32)
        out[0::2] = hi
        out[1::2] = lo
        return out[:n]
    groups = data.reshape(-1, qbits).astype(np.uint64)
    big = np.zeros(len(groups), np.uint64)
    for b in range(qbits):
        big = (big << np.uint64(8)) | groups[:, b]
    out = np.zeros((len(groups), 8), np.int32)
    mask = np.uint64((1 << qbits) - 1)
    for j in range(8):
        shift = np.uint64(qbits * (8 - 1 - j))
        out[:, j] = ((big >> shift) & mask).astype(np.int32)
    return out.reshape(-1)[:n]


def palettize(arr: np.ndarray, qbits: int = 4,
              number_in_blocks: int = 512) -> bytes:
    """ccv_nnc_palettize twin: returns the encoded byte stream."""
    assert qbits in (4, 5, 6, 7, 8)
    flat = np.asarray(arr).reshape(-1)
    dt = flat.dtype
    k = 1 << qbits
    out = bytearray()
    for start in range(0, len(flat), number_in_blocks):
        block = flat[start:start + number_in_blocks].astype(np.float64)
        if len(np.unique(block)) <= k:
            # degenerate block: centroids = unique values padded
            uniq = np.unique(block)
            centroids = np.zeros(k)
            centroids[:len(uniq)] = uniq
            indices = np.searchsorted(uniq, block).astype(np.int32)
        else:
            indices, centroids = kmeans1d(block, k)
        out += centroids.astype(dt).tobytes()
        out += _pack_bits(indices, qbits).tobytes()
    return bytes(out)


def depalettize(data: bytes, datatype: int, n_elements: int, qbits: int,
                number_in_blocks: int) -> np.ndarray:
    """ccv_nnc_depalettize twin (the CPU path of cmd/compression)."""
    dt = _DT_NP[datatype & 0xFF000]
    esize = _DT_SIZE[datatype & 0xFF000]
    k = 1 << qbits
    if qbits == 4:
        idx_bytes = number_in_blocks // 2
    elif qbits == 8:
        idx_bytes = number_in_blocks
    else:
        idx_bytes = number_in_blocks // 8 * qbits
    block_bytes = k * esize + idx_bytes
    raw = np.frombuffer(data, np.uint8)
    out = np.empty(n_elements, dt)
    pos = 0
    start = 0
    while start < n_elements:
        nI = min(number_in_blocks, n_elements - start)
        pal = raw[pos:pos + k * esize].view(dt)
        if qbits == 4:
            nbytes = (nI + 1) // 2
        elif qbits == 8:
            nbytes = nI
        else:
            nbytes = (nI + 7) // 8 * qbits
        packed = raw[pos + k * esize: pos + k * esize + nbytes]
        idx = _unpack_bits(packed, qbits, nI)
        out[start:start + nI] = pal[idx]
        pos += block_bytes
        start += number_in_blocks
    return out


# identifier encoding used by ccv_cnnp_model_write's palettize option:
# identifier = (qbits << 8) | log2(number_in_blocks)? — our own writer uses
# this scheme; reference palettized files carry their params in options.
def encode_identifier(qbits: int, number_in_blocks: int) -> int:
    return (qbits << 16) | number_in_blocks


def decode(data: bytes, datatype: int, shape, identifier: int) -> np.ndarray:
    qbits = (identifier >> 16) & 0xFF
    nib = identifier & 0xFFFF
    n = int(np.prod(shape))
    return depalettize(data, datatype, n, qbits, nib).reshape(shape)


# ---------------------------------------------------------------------------
# On-device depalettize (reference: lib/nnc/cmd/compression/gpu/
# ccv_nnc_depalettize.cu, mps/ccv_nnc_palettize.m) — the reference decodes
# palettized checkpoints ON the accelerator at load so the host never
# materializes the full weights. The TPU twin is one jitted XLA program:
# bitcast the per-block palettes out of the byte stream, unpack the bit-
# packed indices with static shifts (every index spans <= 2 bytes for
# qbits <= 8), and gather per block.
# ---------------------------------------------------------------------------

_JDT = {}


def _jnp_dtype(datatype: int):
    import jax.numpy as jnp

    return {0x20000: jnp.float16, 0x04000: jnp.float32}[datatype & 0xFF000]


def depalettize_device(data, datatype: int, n_elements: int, qbits: int,
                       number_in_blocks: int):
    """ccv_nnc_depalettize on the TPU: `data` is the encoded byte stream
    (bytes or uint8 array); returns a DEVICE jnp array of n_elements.

    f64 streams fall back to the host decoder (no f64 on TPU)."""
    import jax
    import jax.numpy as jnp

    if (datatype & 0xFF000) == 0x10000:  # 64F
        return jnp.asarray(depalettize(bytes(data), datatype, n_elements,
                                       qbits, number_in_blocks))
    esize = _DT_SIZE[datatype & 0xFF000]
    k = 1 << qbits
    nib = number_in_blocks
    if qbits == 4:
        idx_bytes = nib // 2
    elif qbits == 8:
        idx_bytes = nib
    else:
        idx_bytes = nib // 8 * qbits
    block_bytes = k * esize + idx_bytes
    nblocks = -(-n_elements // nib)
    raw = np.frombuffer(data, np.uint8) if isinstance(
        data, (bytes, bytearray, memoryview)) else np.asarray(data, np.uint8)
    pad = nblocks * block_bytes - len(raw)
    if pad > 0:
        raw = np.concatenate([raw, np.zeros(pad, np.uint8)])
    fn = _get_depal_fn(datatype & 0xFF000, qbits, nib, nblocks, n_elements)
    return fn(jnp.asarray(raw[:nblocks * block_bytes]))


def _get_depal_fn(dtt: int, qbits: int, nib: int, nblocks: int, n: int):
    import jax
    import jax.numpy as jnp

    key = (dtt, qbits, nib, nblocks, n)
    fn = _JDT.get(key)
    if fn is not None:
        return fn
    esize = _DT_SIZE[dtt]
    k = 1 << qbits
    jdt = _jnp_dtype(dtt)
    if qbits == 4:
        idx_bytes = nib // 2
    elif qbits == 8:
        idx_bytes = nib
    else:
        idx_bytes = nib // 8 * qbits
    block_bytes = k * esize + idx_bytes

    @jax.jit
    def depal(raw):
        blocks = raw.reshape(nblocks, block_bytes)
        pal = jax.lax.bitcast_convert_type(
            blocks[:, :k * esize].reshape(nblocks, k, esize), jdt)
        packed = blocks[:, k * esize:].astype(jnp.int32)
        if qbits == 8:
            idx = packed
        elif qbits == 4:
            hi, lo = packed >> 4, packed & 0xF
            idx = jnp.stack([hi, lo], axis=-1).reshape(nblocks, nib)
        else:
            # groups of `qbits` bytes hold 8 big-endian indices; index j
            # spans bytes [j*qbits//8, +1] with one zero pad byte for the
            # tail read
            g = packed.reshape(nblocks, nib // 8, qbits)
            g = jnp.concatenate(
                [g, jnp.zeros((nblocks, nib // 8, 1), jnp.int32)], axis=-1)
            mask = (1 << qbits) - 1
            outs = []
            for j in range(8):
                off = j * qbits
                b0, sh = off // 8, off % 8
                v = ((g[..., b0] << 8) | g[..., b0 + 1])
                outs.append((v >> (16 - qbits - sh)) & mask)
            idx = jnp.stack(outs, axis=-1).reshape(nblocks, nib)
        out = jnp.take_along_axis(pal, idx, axis=1)
        return out.reshape(-1)[:n]

    _JDT[key] = depal
    return fn or depal
