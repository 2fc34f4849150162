#!/usr/bin/env python
"""bin/dpmcreate twin:
dpmcreate.py --positive-list pos.txt --background-list bg.txt \
             --negative-count 200 --working-dir dir --model-component 1 \
             --model-part 4

Trains a DPM mixture model (latent SVM over 31-channel HOG root+part
filters with hard-negative mining, reference: bin/dpmcreate.c +
ccv_dpm_mixture_model_new). The positive list has one
`path x y width height` line per example; the background list has one
path per line. Checkpoints land in the working dir exactly like the
reference (model / init.model / gradient_descent_progress), and training
resumes from them."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--positive-list", required=True)
    ap.add_argument("--background-list", required=True)
    ap.add_argument("--working-dir", required=True)
    ap.add_argument("--negative-count", type=int, required=True)
    ap.add_argument("--model-component", type=int, default=1)
    ap.add_argument("--model-part", type=int, default=8)
    ap.add_argument("--symmetric", type=int, default=1)
    ap.add_argument("--iterations", type=int, default=1000)
    ap.add_argument("--relabels", type=int, default=10)
    ap.add_argument("--data-minings", type=int, default=50)
    ap.add_argument("--alpha", type=float, default=0.01)
    ap.add_argument("--alpha-ratio", type=float, default=0.995)
    ap.add_argument("--balance", type=float, default=1.5)
    ap.add_argument("--negative-cache-size", type=int, default=2000)
    ap.add_argument("--c", dest="C", type=float, default=0.002)
    ap.add_argument("--include-overlap", type=float, default=0.7)
    ap.add_argument("--grayscale", type=int, default=0)
    args = ap.parse_args()

    posimgs, bboxes = [], []
    for line in open(args.positive_list):
        parts = line.split()
        if len(parts) < 5:
            continue
        posimgs.append(parts[0])
        bboxes.append(tuple(int(v) for v in parts[1:5]))
    bgimgs = [l.strip() for l in open(args.background_list) if l.strip()]
    print(f"{len(posimgs)} positives, {len(bgimgs)} backgrounds")

    from ccv_tpu.train import dpm as train_dpm

    params = train_dpm.DpmTrainParams(
        components=args.model_component, parts=args.model_part,
        symmetric=bool(args.symmetric), iterations=args.iterations,
        relabels=args.relabels, data_minings=args.data_minings,
        alpha=args.alpha, alpha_ratio=args.alpha_ratio,
        balance=args.balance, negative_cache_size=args.negative_cache_size,
        C=args.C, include_overlap=args.include_overlap,
        grayscale=bool(args.grayscale))
    train_dpm.mixture_model_new(posimgs, bboxes, bgimgs,
                                args.negative_count, args.working_dir,
                                params)
    print(f"model written to {args.working_dir}/model")


if __name__ == "__main__":
    main()
