#!/usr/bin/env python
"""bin/cifar-10 twin: trains the reference's CIFAR-10 convnet architecture
(bin/cifar-10.c layer stack) with ccv_convnet_supervised_train semantics.

Usage: cifar-10.py <train.npz> <test.npz> <out.sqlite3> [epochs]
  npz files hold arrays x (N,31,31,3 uint8) and y (N int). With no
  arguments, runs a short self-test on synthetic data."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def cifar10_net(seed=0):
    from ccv_tpu.models.convnet import (AVERAGE_POOL, CONVOLUTIONAL,
                                        FULL_CONNECT,
                                        LOCAL_RESPONSE_NORM, Convnet,
                                        ConvnetLayer, MAX_POOL)

    rng = np.random.default_rng(seed)

    def conv(ir, ic, cin, count, k, border):
        return ConvnetLayer(
            type=CONVOLUTIONAL, in_rows=ir, in_cols=ic, in_channels=cin,
            in_partition=1, node_count=0, rows=k, cols=k, channels=cin,
            partition=1, count=count, strides=1, border=border,
            w=rng.normal(0, 0.05, (count, k, k, cin)).astype(np.float32),
            bias=np.zeros(count, np.float32))

    def pool(t, ir, ic, cin, size, strides):
        return ConvnetLayer(type=t, in_rows=ir, in_cols=ic, in_channels=cin,
                            in_partition=1, node_count=0, size=size,
                            strides=strides, border=0)

    def lrn(ir, ic, cin):
        return ConvnetLayer(type=LOCAL_RESPONSE_NORM, in_rows=ir, in_cols=ic,
                            in_channels=cin, in_partition=1, node_count=0,
                            size=3, kappa=1.0, alpha=1e-4, beta=0.75)

    # the reference's exact geometry (bin/cifar-10.c): 31x31 inputs so
    # every 3/2 pool divides evenly
    layers = [
        conv(31, 31, 3, 32, 5, 2), lrn(31, 31, 32),
        pool(MAX_POOL, 31, 31, 32, 3, 2),
        conv(15, 15, 32, 32, 5, 2), lrn(15, 15, 32),
        pool(AVERAGE_POOL, 15, 15, 32, 3, 2),
        conv(7, 7, 32, 64, 5, 2),
        pool(AVERAGE_POOL, 7, 7, 64, 3, 2),
        ConvnetLayer(type=FULL_CONNECT, in_rows=3, in_cols=3, in_channels=64,
                     in_partition=1, node_count=3 * 3 * 64, count=10, relu=0,
                     w=rng.normal(0, 0.05, (10, 576)).astype(np.float32),
                     bias=np.zeros(10, np.float32)),
    ]
    return Convnet(layers, (31, 31))


def main():
    from ccv_tpu.models.convnet import ConvnetTrainParams, supervised_train

    if len(sys.argv) >= 4:
        tr = np.load(sys.argv[1])
        te = np.load(sys.argv[2])
        out = sys.argv[3]
        epochs = int(sys.argv[4]) if len(sys.argv) > 4 else 20
        xtr, ytr = tr["x"], tr["y"]
        xte, yte = te["x"], te["y"]
    else:
        print("(no dataset given: synthetic self-test)")
        rng = np.random.default_rng(0)
        xtr = rng.integers(0, 256, (256, 31, 31, 3), dtype=np.uint8)
        ytr = (xtr.mean(axis=(1, 2, 3)) > 127.5).astype(np.int32)
        xte, yte = xtr[:64], ytr[:64]
        out, epochs = "/tmp/cifar10_selftest.sqlite3", 2
    net = cifar10_net()
    hist = supervised_train(
        net, xtr, ytr,
        ConvnetTrainParams(max_epoch=epochs, mini_batch=128,
                           learn_rate=5e-4, momentum=0.9, decay=5e-4,
                           symmetric=True),
        filename=out, tests=(xte, yte))
    for e, (loss, acc) in enumerate(hist):
        print(f"epoch {e + 1}: loss {loss:.4f}"
              + (f", test acc {acc:.3f}" if acc is not None else ""))


if __name__ == "__main__":
    main()
