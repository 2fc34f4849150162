"""ccv_convnet_supervised_train twin: the legacy net learns a synthetic
classification task and the working file round-trips."""

import numpy as np

from ccv_tpu.models.convnet import (AVERAGE_POOL, CONVOLUTIONAL,
                                    FULL_CONNECT, Convnet, ConvnetLayer,
                                    ConvnetTrainParams, MAX_POOL,
                                    supervised_train)


def _tiny_net(seed=0):
    rng = np.random.default_rng(seed)
    layers = [
        ConvnetLayer(type=CONVOLUTIONAL, in_rows=16, in_cols=16,
                     in_channels=1, in_partition=1, node_count=0,
                     rows=3, cols=3, channels=1, partition=1, count=8,
                     strides=1, border=1,
                     w=rng.normal(0, 0.2, (8, 3, 3, 1)).astype(np.float32),
                     bias=np.zeros(8, np.float32)),
        ConvnetLayer(type=MAX_POOL, in_rows=16, in_cols=16, in_channels=8,
                     in_partition=1, node_count=0, strides=2, size=2,
                     border=0),
        ConvnetLayer(type=FULL_CONNECT, in_rows=8, in_cols=8, in_channels=8,
                     in_partition=1, node_count=8 * 8 * 8, count=3, relu=0,
                     w=rng.normal(0, 0.05, (3, 512)).astype(np.float32),
                     bias=np.zeros(3, np.float32)),
    ]
    return Convnet(layers, (16, 16))


def _dataset(n, rng):
    x = rng.normal(50, 10, (n, 16, 16, 1))
    y = rng.integers(0, 3, n)
    for i in range(n):
        if y[i] == 0:
            x[i, 4:12, 7:9] += 120     # vertical bar
        elif y[i] == 1:
            x[i, 7:9, 4:12] += 120     # horizontal bar
        else:
            x[i, 4:12, 4:12] += 60     # block
    return np.clip(x, 0, 255).astype(np.uint8), y.astype(np.int32)


def test_supervised_train_learns(tmp_path):
    rng = np.random.default_rng(1)
    xtr, ytr = _dataset(240, rng)
    xte, yte = _dataset(60, rng)
    net = _tiny_net()
    hist = supervised_train(
        net, xtr, ytr,
        ConvnetTrainParams(max_epoch=6, mini_batch=32, learn_rate=5e-4,
                           momentum=0.9, decay=1e-4),
        filename=str(tmp_path / "work.sqlite3"), tests=(xte, yte))
    assert hist[-1][0] < hist[0][0] * 0.7  # loss drops
    assert hist[-1][1] > 0.8, hist          # test accuracy
    # the working file resumes: reload and check accuracy carries over
    net2 = Convnet.read(str(tmp_path / "work.sqlite3"))
    import jax.numpy as jnp

    logits = np.asarray(net2.encode(xte.astype(np.float32)))
    assert (logits.argmax(-1) == yte).mean() > 0.8
