"""Batched SCD detection: detect_batch == detect per image."""

import numpy as np


def test_detect_batch_matches_single():
    import os

    from ccv_tpu.core.io import read, IO_RGB_COLOR
    from ccv_tpu.detectors import scd

    DATA = os.path.join(os.path.dirname(__file__), "data")
    crop = read(os.path.join(DATA, "crop180.png"), IO_RGB_COLOR)
    casc = scd.load_cascade(os.path.join(DATA, "face_low.sqlite3"))
    # interval=0 halves the pyramid levels: the batch==single property is
    # per-level, so the tier gate doesn't need the denser pyramid
    p = scd.ScdParams(min_neighbors=0, interval=0)
    single = scd.detect(crop.array, casc, p)
    imgs = np.stack([crop.numpy(), np.flip(crop.numpy(), axis=1)])
    batch = scd.detect_batch(imgs, casc, p)
    s = {(c.x, c.y, c.width, c.height, round(c.confidence, 4))
         for c in single}
    b0 = {(c.x, c.y, c.width, c.height, round(c.confidence, 4))
          for c in batch[0]}
    assert b0 == s
    # second image is different content -> different (but valid) windows
    assert len(batch[1]) > 0
