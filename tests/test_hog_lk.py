"""HOG + LK optical flow parity vs reference goldens (tests/data/gen)."""

from conftest import reference_path
import os

import numpy as np

from tests.conftest import requires_reference

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_hog_parity():
    """ccv_hog (ccv_classic.c:4) on a 96x128 chessbox crop, sbin=9 size=8."""
    from ccv_tpu.core.io import read, IO_GRAY
    from ccv_tpu.ops import classic

    img = read(reference_path("samples/chessbox.png"), IO_GRAY)
    crop = np.asarray(img.numpy())[:96, :128]
    mine = np.asarray(classic.hog(crop, sbin=9, size=8))
    with open(os.path.join(DATA, "hog_chessbox_crop.txt")) as f:
        rows, cols, ch = map(int, f.readline().split())
        vals = np.array([float(line) for line in f], np.float32)
    golden = vals.reshape(rows, cols, ch)
    assert mine.shape == golden.shape
    err = np.abs(mine - golden)
    # float-vs-C accumulation order; values are in [0, ~1.2]
    assert err.max() < 2e-3, err.max()
    assert err.mean() < 2e-4, err.mean()


def test_lk_optical_flow_parity():
    """LK flow tracks a (dx=-2, dy=-3) shift; golden from the reference.

    The reference has an upstream typo in its bilinear y-gradient
    (ccv_classic.c:536 `+ iw10`), so the gate is positional tolerance, not
    bit parity.
    """
    from ccv_tpu.core.io import read, IO_GRAY
    from ccv_tpu.ops import classic

    img = np.asarray(read(reference_path("samples/chessbox.png"), IO_GRAY).numpy())
    a = img[: img.shape[0] - 8, : img.shape[1] - 8]
    b = img[3 : img.shape[0] - 5, 2 : img.shape[1] - 6]
    with open(os.path.join(DATA, "lk_chessbox_shift.txt")) as f:
        n = int(f.readline())
        rows = [list(map(float, line.split())) for line in f]
    golden = np.array(rows, np.float32)
    pts = golden[:, :2]
    out, status = classic.optical_flow_lucas_kanade(
        a, b, pts, win_size=(15, 15), level=3, min_eigen=0.01)
    g_status = golden[:, 4] > 0
    both = status & g_status
    assert both.sum() >= 0.9 * n, (status.sum(), g_status.sum())
    # positions within 0.5px of the reference's tracked points
    d = np.abs(out[both] - golden[both, 2:4])
    assert np.median(np.max(d, axis=1)) < 0.25, d
    assert (np.max(d, axis=1) < 0.75).mean() > 0.9, d
