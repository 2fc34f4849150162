"""ccv_convnet wire-format + classify parity (oracle: gen_convnet.c)."""

from conftest import reference_path
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.mark.tpu
def test_convnet_read_and_classify_parity():
    """Read a reference-written SQLite convnet, classify street.png, and
    match ccv_convnet_classify's top-10 ids + confidences."""
    from ccv_tpu.core.io import read, IO_RGB_COLOR
    from ccv_tpu.models.convnet import Convnet

    net = Convnet.read(os.path.join(DATA, "tiny_convnet_f32.sqlite3"))
    assert net.input_size == (32, 32)
    assert len(net.layers) == 6
    img = read(reference_path("samples/street.png"), IO_RGB_COLOR)
    ranks = net.classify(img.numpy(), tops=10)
    with open(os.path.join(DATA, "tiny_convnet_classify.txt")) as f:
        n = int(f.readline())
        golden = [line.split() for line in f]
    golden = [(int(i), float(c)) for i, c in golden]
    assert len(ranks) == n
    # identical ranking, confidences within float tolerance
    assert [r[0] for r in ranks] == [g[0] for g in golden]
    for (ri, rc), (gi, gc) in zip(ranks, golden):
        assert abs(rc - gc) < 1e-3, (ri, rc, gc)


def test_convnet_half_precision_read():
    """The f16 file decodes (half_precision=1 blobs) and classifies close
    to the f32 one."""
    from ccv_tpu.core.io import read, IO_RGB_COLOR
    from ccv_tpu.models.convnet import Convnet

    net16 = Convnet.read(os.path.join(DATA, "tiny_convnet_f16.sqlite3"))
    net32 = Convnet.read(os.path.join(DATA, "tiny_convnet_f32.sqlite3"))
    img = read(reference_path("samples/street.png"), IO_RGB_COLOR)
    r16 = net16.classify(img.numpy(), tops=3)
    r32 = net32.classify(img.numpy(), tops=3)
    assert [r[0] for r in r16] == [r[0] for r in r32]
    for (i16, c16), (i32, c32) in zip(r16, r32):
        assert abs(c16 - c32) < 5e-3


def test_convnet_write_roundtrip(tmp_path):
    """Our writer produces a file our reader (and schema) accepts."""
    from ccv_tpu.models.convnet import Convnet

    net = Convnet.read(os.path.join(DATA, "tiny_convnet_f32.sqlite3"))
    p = str(tmp_path / "roundtrip.sqlite3")
    net.write(p)
    net2 = Convnet.read(p)
    for a, b in zip(net.layers, net2.layers):
        assert a.type == b.type
        if a.w is not None:
            np.testing.assert_array_equal(a.w, b.w)
            np.testing.assert_array_equal(a.bias, b.bias)
    np.testing.assert_array_equal(net.mean_activity, net2.mean_activity)
