#!/usr/bin/env python
"""bin/nnc/coco twin: RPN training on COCO-style annotations
(reference: bin/nnc/coco.c).

Topology: ResNet50-v1d + FPN backbone with a shared 1x1-conv RPN head
(ccv_tpu.models.resnet, coco.c:18-177). Data: a list file of
``class filename x y width height`` lines (coco.c:644 fscanf format),
one line per box, grouped by filename. Training (coco.c:540-610):

* anchors at strides 4/8/16/32/64, 3 aspect ratios (1:2, 1:1, 2:1),
  base size 8 x stride (coco.c:381-398);
* GT assignment per anchor: IoU >= 0.7 positive with (dx, dy, log dw,
  log dh) regression targets, <= 0.3 negative, else ignored; every GT
  box also claims its best-matching anchor (coco.c:214-278);
* per batch, select `select_count` anchors — up to half positives, the
  rest negatives (coco.c:402-414);
* loss = sigmoid binary cross-entropy on objectness + smooth-L1 on the
  box regression of positives, SGD.

    coco.py --train-list list.txt --train-dir images/
    coco.py --demo     # synthetic boxes, checks the loss drops
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

STRIDES = (4, 8, 16, 32, 64)
BOX_SIZE = 8  # anchor base = BOX_SIZE * stride (coco.c:382)


def anchor_shapes(stride: int):
    """coco.c:385-396: (width, height) of the 3 aspect-ratio anchors."""
    a = BOX_SIZE * stride
    a1 = int(np.sqrt(a * a / 2.0) + 0.5)
    return ((a, a), (a1, a1 * 2), (a1 * 2, a1))


def level_grids(rows: int, cols: int):
    """FPN level output grids for an input of (rows, cols): SAME-padded
    stride-2 stages for P2..P5, then P6 = VALID 2x2 avg-pool of P5
    (coco.c builds gt from the model's own tensor_auto shapes — we
    mirror the exact shape arithmetic; bin tools assert against the
    built model)."""
    grids = []
    r, c = rows, cols
    for _ in range(2):  # stem conv s2 + maxpool s2 -> stride 4
        r, c = (r + 1) // 2, (c + 1) // 2
    grids.append((r, c))
    for _ in range(3):  # c3, c4, c5
        r, c = (r + 1) // 2, (c + 1) // 2
        grids.append((r, c))
    grids.append((r // 2, c // 2))  # P6: VALID 2x2 pool
    return grids


def rpn_gt(grids, boxes):
    """Anchor ground truth for one image — numpy twin of coco.c
    _rpn_gt/_rpn_rect_missing_gt. boxes: (n, 4) [x, y, w, h] float.
    Returns gt (total*3, 5): [obj(-1/0/1), dx, dy, log dw, log dh]."""
    chunks = []
    # best anchor per gt box across ALL levels (missing-gt pass)
    best_iou = np.zeros(len(boxes))
    best_ref = [None] * len(boxes)  # (chunk_idx, flat_idx, ax, ay, aw, ah)
    for li, (s, (gh, gw)) in enumerate(zip(STRIDES, grids)):
        for (aw, ah) in anchor_shapes(s):
            ox, oy = (aw - 1) // 2, (ah - 1) // 2
            if aw != ah:
                # coco.c:392-396: the 1:2/2:1 offsets come from the
                # 1:1-equivalent size
                a1 = int(np.sqrt((BOX_SIZE * s) ** 2 / 2.0) + 0.5)
                o1, o2 = (a1 - 1) // 2, a1 - 1
                ox, oy = (o1, o2) if aw < ah else (o2, o1)
            ys, xs = np.mgrid[0:gh, 0:gw]
            rx = (xs * s - ox).ravel().astype(np.float32)
            ry = (ys * s - oy).ravel().astype(np.float32)
            cell = np.zeros((gh * gw, 5), np.float32)
            if len(boxes):
                bx, by, bw, bh = (boxes[:, 0], boxes[:, 1], boxes[:, 2],
                                  boxes[:, 3])
                ix = (np.minimum(rx[:, None] + aw, bx + bw)
                      - np.maximum(rx[:, None], bx)).clip(min=0)
                iy = (np.minimum(ry[:, None] + ah, by + bh)
                      - np.maximum(ry[:, None], by)).clip(min=0)
                inter = ix * iy
                iou = inter / (bw * bh + aw * ah - inter)
                bi = np.argmax(iou, axis=1)
                bv = iou[np.arange(len(rx)), bi]
                pos = bv >= 0.7
                ign = (bv > 0.3) & ~pos
                cell[:, 0] = np.where(pos, 1.0, np.where(ign, -1.0, 0.0))
                gx = bx[bi] + bw[bi] * 0.5
                gy = by[bi] + bh[bi] * 0.5
                x_anchor = (xs * s).ravel()
                y_anchor = (ys * s).ravel()
                cell[pos, 1] = ((gx - x_anchor) / aw)[pos]
                cell[pos, 2] = ((gy - y_anchor) / ah)[pos]
                cell[pos, 3] = np.log(bw[bi] / aw)[pos]
                cell[pos, 4] = np.log(bh[bi] / ah)[pos]
                # track the best anchor for each gt box
                kb = np.argmax(iou, axis=0)
                kv = iou[kb, np.arange(len(boxes))]
                for k in range(len(boxes)):
                    if kv[k] > best_iou[k]:
                        best_iou[k] = kv[k]
                        best_ref[k] = (len(chunks), int(kb[k]),
                                       float(x_anchor[kb[k]]),
                                       float(y_anchor[kb[k]]), aw, ah)
            chunks.append(cell)
    # _rpn_rect_missing_gt: force-assign each gt's best anchor
    for k, ref in enumerate(best_ref):
        if ref is None:
            continue
        ci, fi, ax, ay, aw, ah = ref
        if chunks[ci][fi, 0] != 1.0:
            bx, by, bw, bh = boxes[k]
            chunks[ci][fi] = (1.0, (bx + bw * 0.5 - ax) / aw,
                              (by + bh * 0.5 - ay) / ah,
                              np.log(bw / aw), np.log(bh / ah))
    # interleave the 3 aspect chunks per level to match the RPN output
    # layout (B, H, W, 3*5) flattened
    out = []
    i = 0
    for (gh, gw) in grids:
        trio = np.stack(chunks[i:i + 3], axis=1)  # (gh*gw, 3, 5)
        out.append(trio.reshape(-1, 5))
        i += 3
    return np.concatenate(out, axis=0)


def select_anchors(gt, select_count, rng):
    """coco.c:402-414: up to half positives, rest negatives."""
    order = rng.permutation(len(gt))
    pos = order[gt[order, 0] == 1.0][:select_count // 2]
    neg = order[gt[order, 0] == 0.0][:select_count - len(pos)]
    return np.concatenate([pos, neg]).astype(np.int32)


def load_list(list_file, image_dir):
    """coco.c:636-676 `_array_from_disk_new`: group box lines per file."""
    anns = {}
    with open(list_file) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 6:
                continue
            _, fname, x, y, w, h = parts
            path = os.path.join(image_dir or "", fname)
            anns.setdefault(path, []).append(
                [float(x), float(y), float(w), float(h)])
    return [(p, np.asarray(b, np.float32)) for p, b in anns.items()]


def synthetic_scene(rng, rows, cols, n_boxes=3):
    """Demo data: bright rectangles on dark noise, boxes as GT."""
    img = rng.standard_normal((rows, cols, 3)).astype(np.float32) * 0.1
    boxes = []
    for _ in range(n_boxes):
        w = int(rng.integers(24, min(72, cols // 2 + 1)))
        h = int(rng.integers(24, min(72, rows // 2 + 1)))
        x = int(rng.integers(0, cols - w))
        y = int(rng.integers(0, rows - h))
        img[y:y + h, x:x + w] += rng.uniform(0.8, 1.2)
        boxes.append([x, y, w, h])
    return img, np.asarray(boxes, np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-list")
    ap.add_argument("--train-dir", default="")
    ap.add_argument("--val-list")
    ap.add_argument("--val-dir", default="")
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=128,
                    help="square training crop (demo)")
    ap.add_argument("--select-count", type=int, default=64)
    # _resnet_learn_rate (coco.c:445): 0.001 for the first epochs
    ap.add_argument("--lr", type=float, default=0.001)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ccv_tpu.models import resnet
    from ccv_tpu.nn import ops as nops
    from ccv_tpu.nn import optimizers

    rng = np.random.default_rng(0)
    rows = cols = args.size
    demo = args.demo or not args.train_list

    if demo:
        data = [synthetic_scene(rng, rows, cols) for _ in range(16)]
    else:
        from ccv_tpu.core.io import read, IO_RGB_COLOR
        raw = load_list(args.train_list, args.train_dir)
        data = []
        for path, boxes in raw:
            img = np.asarray(read(path, IO_RGB_COLOR).array,
                             np.float32) / 255.0
            sy = rows / img.shape[0]
            sx = cols / img.shape[1]
            import jax.image  # resize at the host edge

            img = np.asarray(jax.image.resize(jnp.asarray(img),
                                              (rows, cols, 3), "bilinear"))
            data.append((img, boxes * [sx, sy, sx, sy]))
        if not data:
            sys.exit(f"no annotations read from {args.train_list}")

    grids = level_grids(rows, cols)
    total = sum(gh * gw for gh, gw in grids) * 3

    fpn = resnet.resnet50_v1d_fpn()
    fpn.build((args.batch, rows, cols, 3), key=jax.random.PRNGKey(0))
    built = [(s[1], s[2]) for s in fpn.output_shape]
    assert built == grids, (built, grids)  # gt layout must match the model
    rpn = resnet.rpn_init(jax.random.PRNGKey(1))
    params = {"fpn": fpn.params, "rpn": rpn}
    opt = optimizers.sgd(rate=args.lr, momentum=0.9)
    opt_state = opt.init(params)
    sel_n = args.select_count

    @jax.jit
    def train_step(params, state, opt_state, imgs, gt, sel):
        def loss_fn(p):
            feats, new_state = fpn._forward(p["fpn"], state, [imgs], True,
                                            jax.random.PRNGKey(0))
            props = resnet.rpn_apply(p["rpn"], feats)
            flat = jnp.concatenate(
                [pr.reshape(pr.shape[0], -1, 5) for pr in props], axis=1)
            flat = flat.reshape(-1, 5)
            out_sel = jnp.take(flat, sel, axis=0)
            gt_sel = jnp.take(gt.reshape(-1, 5), sel, axis=0)
            bce, _ = nops.sigmoid_binary_crossentropy(out_sel[:, :1],
                                                      gt_sel[:, :1])
            cls_loss = jnp.mean(bce)
            pos = gt_sel[:, 0] == 1.0
            l1 = nops.smooth_l1_loss(out_sel[:, 1:], gt_sel[:, 1:])
            l1_loss = (jnp.sum(jnp.where(pos, l1, 0.0))
                       / jnp.maximum(jnp.sum(pos), 1))
            # accuracy like coco.c:586-596 (logit sign vs truth)
            acc = jnp.mean(((out_sel[:, 0] > 0) ==
                            (gt_sel[:, 0] > 0.5)).astype(jnp.float32))
            return cls_loss + l1_loss, (new_state, acc)

        (loss, (new_state, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # from-scratch backbone (no ImageNet init like coco.c:431): clip
        # the global grad norm to keep early smooth-L1 spikes in check
        grads, _ = optimizers.clip_grad_norm(grads, 5.0)
        new_params, new_opt = opt.update(grads, opt_state, params)
        return new_params, new_state, new_opt, loss, acc

    state = fpn.state
    t0 = time.time()
    loss = acc = None
    for step in range(args.steps):
        idx = rng.integers(0, len(data), args.batch)
        imgs = np.stack([data[i][0] for i in idx])
        gts, sels = [], []
        for bi, i in enumerate(idx):
            g = rpn_gt(grids, data[i][1])
            gts.append(g)
            sels.append(select_anchors(g, sel_n, rng) + bi * total)
        gt = jnp.asarray(np.stack(gts))
        sel = jnp.asarray(np.concatenate(sels))
        params, state, opt_state, loss, acc = train_step(
            params, state, opt_state, jnp.asarray(imgs), gt, sel)
        if step % 10 == 9:
            sps = (step + 1) * args.batch / (time.time() - t0)
            print(f"step {step + 1}: loss {float(loss):.4f} "
                  f"accuracy {float(acc) * 100:.1f}% "
                  f"({sps:.2f} samples/sec)")
    print(f"final loss {float(loss):.4f} accuracy {float(acc) * 100:.1f}%")
    return float(loss), float(acc)


if __name__ == "__main__":
    main()
