#!/usr/bin/env python
"""bin/scdcreate twin: scdcreate.py <positives-dir> <negatives-dir> <out.sqlite3>

Trains an SCD (SURF-cascade) detector with gentle AdaBoost from directories
of positive patches and negative images (reference: bin/scdcreate.c +
ccv_scd_classifier_cascade_new). Patch size and boosting params via flags.
"""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _load_dir(path, size, crop_negatives=False, per_image=8, seed=0):
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
        if crop_negatives:
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
    ap.add_argument("--size", type=int, nargs=2, default=(40, 40))
    ap.add_argument("--boosting", type=int, default=4)
    ap.add_argument("--max-feature", type=int, default=16)
    ap.add_argument("--hit-rate", type=float, default=0.995)
    args = ap.parse_args()
    from ccv_tpu.train import scd as train_scd

    size = tuple(args.size)
    pos = _load_dir(args.positives, size)
    neg = _load_dir(args.negatives, size, crop_negatives=True)
    print(f"{len(pos)} positives, {len(neg)} negative patches")
    params = train_scd.ScdTrainParams(
        size=size, boosting=args.boosting, maximum_feature=args.max_feature,
        hit_rate=args.hit_rate)
    cascade = train_scd.train_cascade(pos, neg, params)
    train_scd.write_cascade(cascade, args.output)
    print(f"wrote {cascade.n_stages}-stage cascade"
          f" ({cascade.n_features} features) to {args.output}")


if __name__ == "__main__":
    main()
