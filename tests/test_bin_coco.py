"""bin/coco twin: RPN anchor ground-truth machinery + demo training gate
(reference: bin/nnc/coco.c:214-414 `_rpn_gt` / anchor selection)."""

import os
import sys

import numpy as np
import pytest

BIN = os.path.join(os.path.dirname(__file__), "..", "bin")
sys.path.insert(0, BIN)

import coco  # noqa: E402  (bin/coco.py)


def test_level_grids_match_built_model():
    import jax

    from ccv_tpu.models import resnet

    fpn = resnet.resnet50_v1d_fpn()
    fpn.build((1, 96, 96, 3), key=jax.random.PRNGKey(0))
    built = [(s[1], s[2]) for s in fpn.output_shape]
    assert built == coco.level_grids(96, 96)
    fpn2 = resnet.resnet50_v1d_fpn()
    fpn2.build((1, 128, 160, 3), key=jax.random.PRNGKey(0))
    built2 = [(s[1], s[2]) for s in fpn2.output_shape]
    assert built2 == coco.level_grids(128, 160)


def test_rpn_gt_assigns_square_anchor():
    grids = coco.level_grids(96, 96)
    total = sum(gh * gw for gh, gw in grids) * 3
    # a box exactly on the 1:1 stride-4 anchor lattice: 32x32 at (8, 12)
    boxes = np.asarray([[8.0, 12.0, 32.0, 32.0]], np.float32)
    gt = coco.rpn_gt(grids, boxes)
    assert gt.shape == (total, 5)
    pos = gt[:, 0] == 1.0
    # IoU>=0.7 positives exist and carry finite log-space regression
    assert pos.sum() >= 1
    assert np.isfinite(gt[pos, 1:]).all()
    # the exact-match anchor regresses to ~zero offsets
    best = np.abs(gt[pos, 1:]).sum(axis=1).min()
    assert best < 0.3, best


def test_rpn_gt_missing_gt_pass_claims_best_anchor():
    grids = coco.level_grids(96, 96)
    # a thin 11x45 box matches no anchor at IoU 0.7; the missing-gt pass
    # (coco.c _rpn_rect_missing_gt) must still force one positive
    boxes = np.asarray([[30.0, 20.0, 11.0, 45.0]], np.float32)
    gt = coco.rpn_gt(grids, boxes)
    assert (gt[:, 0] == 1.0).sum() >= 1


def test_select_anchors_half_positive_cap():
    rng = np.random.default_rng(0)
    gt = np.zeros((100, 5), np.float32)
    gt[:40, 0] = 1.0   # 40 positives
    gt[40:50, 0] = -1.0  # 10 ignored
    sel = coco.select_anchors(gt, 32, rng)
    assert len(sel) == 32
    labels = gt[sel, 0]
    assert (labels == 1.0).sum() == 16  # up to half positives
    assert (labels == -1.0).sum() == 0  # ignored never selected


@pytest.mark.slow
def test_coco_demo_loss_drops():
    old = sys.argv
    sys.argv = ["coco", "--demo", "--steps", "20", "--size", "96",
                "--batch", "2"]
    try:
        loss, acc = coco.main()
    finally:
        sys.argv = old
    # BCE starts ~0.69 + smooth-L1 ~0.7; 20 SGD steps cut it visibly
    assert loss < 1.25, loss
