"""Palettize wire-format parity vs reference-encoded files
(tests/data/gen/gen_palettize.c) — round 1 only self-certified this."""

import os
import struct

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
DT_NP = {0x20000: np.float16, 0x04000: np.float32}


def _load(name):
    raw = open(os.path.join(DATA, name), "rb").read()
    datatype, qbits, nb, n = struct.unpack("<4i", raw[:16])
    (sz,) = struct.unpack("<q", raw[16:24])
    comp = np.frombuffer(raw[24:24 + sz], np.uint8)
    dt = DT_NP[datatype]
    ref_out = np.frombuffer(raw[24 + sz:], dt)
    assert len(ref_out) == n
    return datatype, qbits, nb, n, comp, ref_out


@pytest.mark.parametrize("name", ["palettize_f32_q4.bin",
                                  "palettize_f32_q5.bin",
                                  "palettize_f16_q8.bin"])
def test_decode_reference_palettized(name):
    """Our depalettize must decode reference-encoded bytes bit-exactly."""
    from ccv_tpu.nn import palettize

    datatype, qbits, nb, n, comp, ref_out = _load(name)
    mine = np.asarray(palettize.depalettize(
        bytes(comp), datatype, n, qbits, nb))
    np.testing.assert_array_equal(mine.astype(ref_out.dtype), ref_out)


@pytest.mark.parametrize("name", ["palettize_f32_q4.bin",
                                  "palettize_f16_q8.bin"])
def test_encode_decodes_by_reference_layout(name):
    """Our encoder's bytes must decode (by our reference-verified decoder)
    to the same values the reference round trip produces."""
    from ccv_tpu.nn import palettize

    datatype, qbits, nb, n, comp, ref_out = _load(name)
    dt = DT_NP[datatype]
    # reconstruct the original input exactly like the generator
    i = np.arange(n, dtype=np.uint64)
    f32 = (np.sin(np.arange(n) * 0.37) * 3.0
           + (((i * np.uint64(2654435761)) >> np.uint64(16))
              & np.uint64(255)).astype(np.float64) * 0.01).astype(np.float32)
    src = f32.astype(dt)
    enc = palettize.palettize(src, qbits, nb)
    dec = np.asarray(palettize.depalettize(enc, datatype, n, qbits, nb))
    err = np.abs(dec.astype(np.float64) - ref_out.astype(np.float64))
    ref_err = np.abs(ref_out.astype(np.float64) - src.astype(np.float64))
    # same quantization quality as the reference encoder
    assert err.max() <= 2 * max(ref_err.max(), 1e-6)


@pytest.mark.parametrize("name", ["palettize_f32_q4.bin",
                                  "palettize_f32_q5.bin",
                                  "palettize_f16_q8.bin"])
def test_device_depalettize_matches_host(name):
    """The on-device (XLA) depalettize must match the host decoder
    bit-for-bit on reference-encoded bytes."""
    from ccv_tpu.nn import palettize

    datatype, qbits, nb, n, comp, ref_out = _load(name)
    dev = np.asarray(palettize.depalettize_device(
        bytes(comp), datatype, n, qbits, nb))
    np.testing.assert_array_equal(dev.astype(ref_out.dtype), ref_out)


@pytest.mark.tpu
@pytest.mark.parametrize("name", ["palettize_f32_q4.bin",
                                  "palettize_f16_q8.bin"])
def test_device_depalettize_on_chip(name):
    """Real-chip tier: reference-encoded bytes decode bit-exactly ON the
    TPU (the gpu/ccv_nnc_depalettize.cu role)."""
    from ccv_tpu.nn import palettize

    datatype, qbits, nb, n, comp, ref_out = _load(name)
    # under --tpu the session default backend IS the chip, so the decode
    # program runs there; under the CPU CI tier this is the same equality
    out = palettize.depalettize_device(bytes(comp), datatype, n, qbits, nb)
    np.testing.assert_array_equal(
        np.asarray(out).astype(ref_out.dtype), ref_out)
