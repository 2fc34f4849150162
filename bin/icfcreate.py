#!/usr/bin/env python
"""bin/icfcreate twin: icfcreate.py <positives-dir> <negatives-dir> <out.icf>

Trains an ICF detector (discrete AdaBoost over depth-2 trees of random
integral-channel features, reference: bin/icfcreate.c +
ccv_icf_classifier_cascade_new)."""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _load_dir(path, size, crop=False, per_image=8, seed=0):
    from ccv_tpu.core.io import read, IO_RGB_COLOR
    from ccv_tpu.ops import resample
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    W, H = size
    out = []
    for name in sorted(os.listdir(path)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
            continue
        img = np.asarray(read(os.path.join(path, name), IO_RGB_COLOR).numpy())
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
                    jnp.asarray(img), rows=H, cols=W,
                    rows_scale=H / img.shape[0], cols_scale=W / img.shape[1],
                    interp=resample.INTER_AREA)).astype(np.uint8)
            out.append(img)
    return np.stack(out)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("positives")
    ap.add_argument("negatives")
    ap.add_argument("output")
    ap.add_argument("--size", type=int, nargs=2, default=(30, 60))
    ap.add_argument("--feature-size", type=int, default=2000)
    ap.add_argument("--weak-classifier", type=int, default=64)
    args = ap.parse_args()
    from ccv_tpu.train import icf as train_icf

    size = tuple(args.size)
    pos = _load_dir(args.positives, size)
    neg = _load_dir(args.negatives, size, crop=True)
    print(f"{len(pos)} positives, {len(neg)} negative patches")
    params = train_icf.IcfTrainParams(
        size=size, feature_size=args.feature_size,
        weak_classifier=args.weak_classifier)
    cascade = train_icf.train_cascade(pos, neg, params)
    train_icf.write_cascade(cascade, args.output)
    print(f"wrote {cascade.n_weak}-weak ICF cascade to {args.output}")


if __name__ == "__main__":
    main()
