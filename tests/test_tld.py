"""TLD tracker behavioral tests.

Bit parity with the reference is impossible (it seeds SFMT from heap
pointer values, ccv_tld.c:685), so the gates are behavioral: track a known
rigid shift across frames with IoU bounds. The target is a distinctive
region of street.png — on self-similar texture (e.g. a chessboard) TLD's
detector legitimately cannot disambiguate the target, reference included.
"""

from conftest import reference_path
import numpy as np
import pytest


def iou(r1, r2):
    ix = max(0, min(r1[0] + r1[2], r2[0] + r2[2]) - max(r1[0], r2[0]))
    iy = max(0, min(r1[1] + r1[3], r2[1] + r2[3]) - max(r1[1], r2[1]))
    inter = ix * iy
    return inter / (r1[2] * r1[3] + r2[2] * r2[3] - inter)


BOX0 = (440, 150, 60, 120)  # the pedestrian in street.png


@pytest.fixture(scope="module")
def frames():
    from ccv_tpu.core.io import read, IO_GRAY

    img = np.asarray(read(reference_path("samples/street.png"),
                          IO_GRAY).numpy())
    shifts = [(0, 0), (3, 2), (6, 4), (9, 6)]
    H, W = img.shape[0] - 12, img.shape[1] - 12
    return [img[dy:dy + H, dx:dx + W] for dx, dy in shifts], shifts


@pytest.mark.slow
def test_tld_tracks_shift(frames):
    from ccv_tpu.detectors import tld

    seq, shifts = frames
    t = tld.Tld(seq[0], BOX0, seed=7)
    box = BOX0
    for i in range(1, len(seq)):
        info = tld.TldInfo()
        box, conf = t.track_object(seq[i - 1], seq[i], info)
        assert box is not None, f"lost at frame {i}"
        dx, dy = shifts[i]
        expect = (BOX0[0] - dx, BOX0[1] - dy, BOX0[2], BOX0[3])
        assert iou(box, expect) > 0.5, (i, box, expect)


@pytest.mark.slow
def test_tld_relocates_after_occlusion(frames):
    """Blank the scene for one frame: found goes False, then the
    ferns+NNC detector relocates the target."""
    from ccv_tpu.detectors import tld

    seq, shifts = frames
    t = tld.Tld(seq[0], BOX0, seed=3)
    blank = np.full_like(seq[0], 128)
    box, conf = t.track_object(seq[0], blank)
    assert not t.found
    box, conf = t.track_object(blank, seq[0])
    assert box is not None, "failed to relocate"
    assert iou(box, BOX0) > 0.4, (box, BOX0)


def test_tld_tracks_shift_small_frames():
    """Default-tier TLD gate: same rigid-shift tracking on a cropped
    window so it runs in seconds (the full-frame variants are --slow)."""
    from ccv_tpu.core.io import read, IO_GRAY
    from ccv_tpu.detectors import tld

    img = np.asarray(read(reference_path("samples/street.png"),
                          IO_GRAY).numpy())[100:260, 390:550]
    box0 = (40, 40, 48, 80)
    shifts = [(0, 0), (3, 2)]
    H, W = img.shape[0] - 8, img.shape[1] - 8
    seq = [img[dy:dy + H, dx:dx + W] for dx, dy in shifts]
    t = tld.Tld(seq[0], box0, seed=7)
    for i in range(1, len(seq)):
        box, conf = t.track_object(seq[i - 1], seq[i])
        assert box is not None, f"lost at frame {i}"
        dx, dy = shifts[i]
        expect = (box0[0] - dx, box0[1] - dy, box0[2], box0[3])
        assert iou(box, expect) > 0.5, (i, box, expect)
