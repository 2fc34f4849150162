"""Transformer family tests (reference: bin/nnc/wmt.c, imdb.c topologies)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccv_tpu.models import transformer as tf
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CFG = tf.TransformerConfig(vocab_size=37, tgt_vocab_size=41, layers=2,
                           heads=2, head_dim=8, ff=32, max_len=16,
                           dropout=0.1, dtype=jnp.float32)


def test_encoder_decoder_shapes_and_grad():
    key = jax.random.PRNGKey(0)
    params = tf.init_encoder_decoder(key, CFG)
    src = jax.random.randint(key, (3, 10), 0, CFG.vocab_size)
    tgt = jax.random.randint(key, (3, 12), 0, CFG.tgt_vocab_size)
    src_mask = jnp.arange(10)[None, :] < jnp.array([[10], [7], [4]])
    logits = tf.encoder_decoder_forward(params, CFG, src, tgt,
                                        src_mask=src_mask)
    assert logits.shape == (3, 12, 41)
    assert np.isfinite(np.asarray(logits)).all()

    labels = jax.random.randint(key, (3, 12), 0, CFG.tgt_vocab_size)

    def loss_fn(p):
        lg = tf.encoder_decoder_forward(p, CFG, src, tgt, src_mask=src_mask,
                                        train=True, key=jax.random.PRNGKey(1))
        return tf.cross_entropy(lg, labels, label_smoothing=0.1)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.square(g))), grads, 0.0)
    assert gnorm > 0.0 and np.isfinite(gnorm)


def test_classifier_and_lm():
    key = jax.random.PRNGKey(0)
    cfg = tf.TransformerConfig(vocab_size=29, layers=1, heads=2, head_dim=8,
                               ff=16, dropout=0.0, dtype=jnp.float32)
    p = tf.init_encoder_classifier(key, cfg, num_classes=2)
    ids = jax.random.randint(key, (4, 9), 0, 29)
    mask = jnp.arange(9)[None, :] < jnp.array([[9], [3], [5], [9]])
    out = tf.encoder_classifier_forward(p, cfg, ids, src_mask=mask)
    assert out.shape == (4, 2)

    plm = tf.init_lm(key, cfg)
    lg = tf.lm_forward(plm, cfg, ids)
    assert lg.shape == (4, 9, 29)
    # causality: changing a later token must not change earlier logits
    ids2 = ids.at[:, -1].set((ids[:, -1] + 1) % 29)
    lg2 = tf.lm_forward(plm, cfg, ids2)
    np.testing.assert_allclose(np.asarray(lg[:, :-1]),
                               np.asarray(lg2[:, :-1]), rtol=1e-5)


def test_lm_overfits_tiny_sequence():
    key = jax.random.PRNGKey(2)
    cfg = tf.TransformerConfig(vocab_size=11, layers=1, heads=2, head_dim=8,
                               ff=32, dropout=0.0, dtype=jnp.float32)
    params = tf.init_lm(key, cfg)
    ids = jnp.tile(jnp.arange(8)[None, :], (2, 1)) % 11

    from ccv_tpu.nn import optimizers
    opt = optimizers.adam(rate=1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            lg = tf.lm_forward(p, cfg, ids[:, :-1])
            return tf.cross_entropy(lg, ids[:, 1:])
        loss, g = jax.value_and_grad(loss_fn)(p)
        p, s = opt.update(g, s, p)
        return p, s, loss

    first = None
    for _ in range(30):
        params, state, loss = step(params, state)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.3, (first, float(loss))


def test_tensor_parallel_matches_single_device():
    """tp-sharded forward == replicated forward (GSPMD collectives on a
    2x4 virtual mesh; twin of the reference's parallel numerics test
    test/int/nnc/parallel.tests.c)."""
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "model"))
    cfg = tf.TransformerConfig(vocab_size=31, layers=2, heads=4, head_dim=8,
                               ff=64, dropout=0.0, dtype=jnp.float32)
    params = tf.init_lm(jax.random.PRNGKey(3), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(4), (4, 8), 0, 31)

    base = np.asarray(tf.lm_forward(params, cfg, ids))

    sh = tf.shardings(params, mesh)
    params_sh = jax.tree_util.tree_map(jax.device_put, params, sh)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    with mesh:
        out = jax.jit(lambda p, i: tf.lm_forward(p, cfg, i))(params_sh, ids_sh)
    np.testing.assert_allclose(np.asarray(out), base, atol=2e-4, rtol=2e-4)
