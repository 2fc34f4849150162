#!/usr/bin/env python
"""bin/bbfcreate twin: bbfcreate.py <positives-dir> <negatives-dir> <out-dir>

Trains a BBF face-detector cascade (genetic feature search + AdaBoost,
reference: bin/bbfcreate.c + ccv_bbf_classifier_cascade_new). The output
directory holds cascade.txt + stage-N.txt, readable by bbfdetect."""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _load_dir(path, size, crop=False, per_image=8, seed=0):
    from ccv_tpu.core.io import read, IO_GRAY
    from ccv_tpu.ops import resample
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    W, H = size
    out = []
    for name in sorted(os.listdir(path)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
            continue
        img = np.asarray(read(os.path.join(path, name), IO_GRAY).numpy())
        if crop:
            for _ in range(per_image):
                if img.shape[0] <= H or img.shape[1] <= W:
                    break
                y = rng.integers(0, img.shape[0] - H)
                x = rng.integers(0, img.shape[1] - W)
                out.append(img[y:y + H, x:x + W])
        else:
            if img.shape[:2] != (H, W):
                img = np.asarray(resample.resample(
                    jnp.asarray(img[..., None]), rows=H, cols=W,
                    rows_scale=H / img.shape[0], cols_scale=W / img.shape[1],
                    interp=resample.INTER_AREA))[..., 0].astype(np.uint8)
            out.append(img)
    return np.stack(out)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("positives")
    ap.add_argument("negatives")
    ap.add_argument("output")
    ap.add_argument("--size", type=int, nargs=2, default=(24, 24))
    ap.add_argument("--stages", type=int, default=8)
    ap.add_argument("--features-per-stage", type=int, default=32)
    args = ap.parse_args()
    from ccv_tpu.train import bbf as train_bbf

    size = tuple(args.size)
    pos = _load_dir(args.positives, size)
    neg = _load_dir(args.negatives, size, crop=True)
    print(f"{len(pos)} positives, {len(neg)} negative patches")
    params = train_bbf.BbfTrainParams(
        size=size, n_stages=args.stages,
        max_features_per_stage=args.features_per_stage)
    cas = train_bbf.train_cascade(pos, neg, params)
    train_bbf.write_cascade(cas, args.output)
    print(f"wrote {cas.n_stages}-stage BBF cascade to {args.output}/")


if __name__ == "__main__":
    main()
