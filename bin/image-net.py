#!/usr/bin/env python
"""bin/image-net twin: trains the reference's MattNet-C ImageNet convnet
(bin/image-net.c + bin/matt_models.inc matt_c_params) with
ccv_convnet_supervised_train semantics (SGD + momentum + decay, resumable
working file).

Usage:
  image-net.py --train-list train.txt --test-list test.txt \
               --working-dir dir [--max-epoch 100] [--scale 1.0]
List lines: `<label> <image-path>`. `--self-test` runs a tiny synthetic
end-to-end check instead (scaled-down net, random data)."""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def matt_c_net(num_classes=1000, scale=1.0, input_size=225, seed=0):
    """matt_models.inc matt_c_params twin: 13 weighted layers, grouped
    (partition=2) convolutions like the 4-GPU model-parallel original."""
    from ccv_tpu.models.convnet import (CONVOLUTIONAL, Convnet,
                                        ConvnetLayer, FULL_CONNECT,
                                        LOCAL_RESPONSE_NORM, MAX_POOL)

    rng = np.random.default_rng(seed)

    def ch(n):
        return max(int(n * scale), 8)

    def conv(ir, ic, cin, count, k, border, strides=1, parts=1):
        std = np.sqrt(2.0) / np.sqrt(k * k * cin / parts)
        return ConvnetLayer(
            type=CONVOLUTIONAL, in_rows=ir, in_cols=ic, in_channels=cin,
            in_partition=parts, node_count=0, rows=k, cols=k,
            channels=cin, partition=parts, count=count, strides=strides,
            border=border,
            w=rng.normal(0, std, (count, k, k, cin // parts))
            .astype(np.float32),
            bias=np.zeros(count, np.float32))

    def pool(ir, ic, cin, size=3, strides=2):
        return ConvnetLayer(type=MAX_POOL, in_rows=ir, in_cols=ic,
                            in_channels=cin, in_partition=1, node_count=0,
                            size=size, strides=strides, border=0)

    def lrn(ir, ic, cin, parts=1):
        return ConvnetLayer(type=LOCAL_RESPONSE_NORM, in_rows=ir,
                            in_cols=ic, in_channels=cin, in_partition=parts,
                            node_count=0, size=5, kappa=2.0, alpha=1e-4,
                            beta=0.75)

    def fc(nin, nout, relu=True):
        std = 1.0 / np.sqrt(nin)
        return ConvnetLayer(type=FULL_CONNECT, in_rows=1, in_cols=1,
                            in_channels=nin, in_partition=1, node_count=nin,
                            count=nout, relu=relu,
                            w=rng.normal(0, std, (nout, nin))
                            .astype(np.float32),
                            bias=np.zeros(nout, np.float32))

    s = input_size
    s1 = (s + 2 - 7) // 2 + 1                     # conv1 stride 2, border 1
    p1 = (s1 - 3 + 1) // 2 + 1                    # pool ceil
    p2 = (p1 - 3 + 1) // 2 + 1
    p3 = (p2 - 3 + 1) // 2 + 1
    p4 = (p3 - 3 + 1) // 2 + 1
    layers = [
        conv(s, s, 3, ch(128), 7, 1, strides=2, parts=1),
        lrn(s1, s1, ch(128), parts=2),
        pool(s1, s1, ch(128)),
        conv(p1, p1, ch(128), ch(384), 3, 1, parts=2),
        lrn(p1, p1, ch(384), parts=2),
        pool(p1, p1, ch(384)),
        conv(p2, p2, ch(384), ch(512), 3, 1),
        conv(p2, p2, ch(512), ch(512), 3, 1, parts=2),
        conv(p2, p2, ch(512), ch(512), 3, 1, parts=2),
        pool(p2, p2, ch(512)),
        conv(p3, p3, ch(512), ch(512), 3, 1),
        conv(p3, p3, ch(512), ch(512), 3, 1, parts=2),
        pool(p3, p3, ch(512)),
        fc(p4 * p4 * ch(512), ch(4096)),
        fc(ch(4096), ch(4096)),
        fc(ch(4096), num_classes, relu=False),
    ]
    return Convnet(layers, (s, s))


def _load_list(path, size):
    from ccv_tpu.core.io import read, IO_RGB_COLOR
    from ccv_tpu.ops import resample
    import jax.numpy as jnp

    xs, ys = [], []
    for line in open(path):
        parts = line.split()
        if len(parts) < 2:
            continue
        label, p = int(parts[0]), parts[1]
        img = np.asarray(read(p, IO_RGB_COLOR).array)
        if img.shape[:2] != (size, size):
            img = np.asarray(resample.resample(
                jnp.asarray(img.astype(np.float32)), rows=size, cols=size,
                rows_scale=size / img.shape[0],
                cols_scale=size / img.shape[1],
                interp=resample.INTER_AREA))
        xs.append(np.clip(img, 0, 255).astype(np.uint8))
        ys.append(label)
    return np.stack(xs), np.array(ys, np.int64)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train-list")
    ap.add_argument("--test-list")
    ap.add_argument("--working-dir", default=".")
    ap.add_argument("--max-epoch", type=int, default=100)
    ap.add_argument("--mini-batch", type=int, default=64)
    ap.add_argument("--learn-rate", type=float, default=0.01)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="channel-width multiplier (for small machines)")
    ap.add_argument("--num-classes", type=int, default=1000)
    ap.add_argument("--self-test", action="store_true")
    args = ap.parse_args()

    from ccv_tpu.models.convnet import ConvnetTrainParams, supervised_train

    if args.self_test:
        net = matt_c_net(num_classes=4, scale=0.08, input_size=33, seed=0)
        rng = np.random.default_rng(0)
        X = rng.integers(0, 255, (32, 33, 33, 3)).astype(np.uint8)
        Y = rng.integers(0, 4, (32,))
        hist = supervised_train(
            net, X, Y, ConvnetTrainParams(max_epoch=3, mini_batch=8,
                                          learn_rate=args.learn_rate))
        print(f"self-test losses: {[round(h[0], 3) for h in hist]}")
        return

    assert args.train_list, "--train-list required (or --self-test)"
    net = matt_c_net(num_classes=args.num_classes, scale=args.scale)
    X, Y = _load_list(args.train_list, net.rows)
    tests = _load_list(args.test_list, net.rows) if args.test_list else None
    os.makedirs(args.working_dir, exist_ok=True)
    out = os.path.join(args.working_dir, "image-net.sqlite3")
    hist = supervised_train(
        net, X, Y,
        ConvnetTrainParams(max_epoch=args.max_epoch,
                           mini_batch=args.mini_batch,
                           learn_rate=args.learn_rate),
        filename=out, tests=tests)
    print(f"trained {len(hist)} epochs; model at {out}")


if __name__ == "__main__":
    main()
