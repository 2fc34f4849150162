"""LSSC activation compression (ccv_nnc_lssc_cpu_ref.c twin)."""

import numpy as np

import jax
import jax.numpy as jnp

from ccv_tpu.nn.compression import (compressed_apply, lssc_compress,
                                    lssc_decompress)


def test_lssc_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 13, 17, 3), np.float32)  # non-multiple dims
    lo, hi, idx = lssc_compress(jnp.asarray(x))
    y = np.asarray(lssc_decompress(lo, hi, idx, x.shape))
    assert y.shape == x.shape
    # error bounded by a third of each block's range (2-bit levels)
    xb = np.pad(x, [(0, 0), (0, 3), (0, 3), (0, 0)], mode="edge")
    blocks = xb.reshape(2, 4, 4, 5, 4, 3)
    rng_ = blocks.max(axis=(2, 4)) - blocks.min(axis=(2, 4))
    err = np.abs(y - x)
    for b in range(2):
        for i in range(x.shape[1]):
            for j in range(x.shape[2]):
                for c in range(3):
                    bound = rng_[b, i // 4, j // 4, c] / 3 * 1.01 + 1e-2
                    assert err[b, i, j, c] <= bound


def test_lssc_constant_block_exact():
    x = jnp.full((1, 8, 8, 2), 3.25, jnp.float32)
    lo, hi, idx = lssc_compress(x)
    y = lssc_decompress(lo, hi, idx, x.shape)
    np.testing.assert_allclose(np.asarray(y), 3.25)


def test_lssc_compression_ratio():
    x = jnp.zeros((1, 32, 32, 4), jnp.float16)
    lo, hi, idx = lssc_compress(x)
    packed_bytes = lo.size * 2 + hi.size * 2 + idx.size * 4
    assert packed_bytes * 4 == x.size * 2  # 4:1 vs fp16


def test_training_with_compression_converges():
    from ccv_tpu.nn import layers as L, optimizers
    from ccv_tpu.nn.model import Sequential

    m = Sequential([
        L.Convolution(8, (3, 3), padding="SAME", name="c1"), L.ReLU(),
        L.Convolution(8, (3, 3), padding="SAME", name="c2"), L.ReLU(),
        L.Flatten(), L.Dense(4, name="fc")])
    m.build((4, 8, 8, 2))
    m.set_memory_compression(True)
    m.compile(optimizers.adam(rate=1e-2), "softmax_crossentropy")
    rng = np.random.default_rng(0)
    X = rng.standard_normal((4, 8, 8, 2), np.float32)
    Y = rng.integers(0, 4, (4,))
    losses = [m.fit(X, Y) for _ in range(40)]
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_training_with_memory_reduction_converges():
    from ccv_tpu.nn import layers as L, optimizers
    from ccv_tpu.nn.model import Sequential

    m = Sequential([
        L.Convolution(8, (3, 3), padding="SAME", name="c1"), L.ReLU(),
        L.Flatten(), L.Dense(4, name="fc")])
    m.build((4, 8, 8, 2))
    m.set_memory_reduction(True)
    m.compile(optimizers.adam(rate=1e-2), "softmax_crossentropy")
    rng = np.random.default_rng(0)
    X = rng.standard_normal((4, 8, 8, 2), np.float32)
    Y = rng.integers(0, 4, (4,))
    losses = [m.fit(X, Y) for _ in range(40)]
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_memory_reduction_grads_close_to_exact():
    import jax
    import jax.numpy as jnp

    from ccv_tpu.nn.compression import reduced_apply

    def apply_fn(p, s, x, training, key):
        return jnp.tanh(x @ p), s

    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.standard_normal((16, 8), np.float32))
    x = jnp.asarray(rng.standard_normal((4, 16), np.float32))

    def loss_exact(p, x):
        y, _ = apply_fn(p, None, x, True, None)
        return (y ** 2).sum()

    def loss_reduced(p, x):
        y, _ = reduced_apply(apply_fn, jnp.float32, True)(p, None, x, None)
        return (y ** 2).sum()

    g1 = jax.grad(loss_exact)(p, x)
    g2 = jax.grad(loss_reduced)(p, x)
    # backward recomputes from a bf16-stored activation: close, not exact
    assert float(jnp.max(jnp.abs(g1 - g2))) < 0.05
    assert float(jnp.max(jnp.abs(g1 - g2))) > 0.0
