"""Pallas flash-attention parity vs the plain-XLA SDPA op."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccv_tpu.nn import ops
from ccv_tpu.ops.pallas import flash_attention


@pytest.mark.parametrize("T,causal", [(128, False), (128, True),
                                      (100, True), (257, False)])
def test_flash_matches_xla(T, causal):
    rng = np.random.default_rng(0)
    B, H, D = 2, 3, 64
    q = rng.standard_normal((B, T, H, D), np.float32)
    k = rng.standard_normal((B, T, H, D), np.float32)
    v = rng.standard_normal((B, T, H, D), np.float32)
    a = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), None, causal))
    b = np.asarray(ops.scaled_dot_product_attention(q, k, v,
                                                    is_causal=causal))
    assert a.shape == b.shape
    assert np.abs(a - b).max() < 2e-2, np.abs(a - b).max()


@pytest.mark.parametrize("T,Tk,causal", [(64, 64, True), (100, 100, True),
                                         (128, 128, False), (72, 136, False)])
def test_flash_pallas_backward(T, Tk, causal, monkeypatch):
    """The Pallas backward kernels (dq + dk/dv, FLASH_BWD=pallas) agree
    with differentiating the XLA op — including ragged T and cross
    lengths."""
    import importlib

    # the package re-exports the function under the module's name, so an
    # attribute import would grab the custom_vjp object, not the module
    fa_mod = importlib.import_module("ccv_tpu.ops.pallas.flash_attention")
    monkeypatch.setattr(fa_mod, "FLASH_BWD", "pallas")
    rng = np.random.default_rng(3)
    B, H, D = 2, 2, 32
    q = jnp.asarray(rng.standard_normal((B, T, H, D), np.float32))
    k = jnp.asarray(rng.standard_normal((B, Tk, H, D), np.float32))
    v = jnp.asarray(rng.standard_normal((B, Tk, H, D), np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, causal) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(ops.scaled_dot_product_attention(
            q, k, v, is_causal=causal) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 5e-3


def test_flash_gradient():
    """custom_vjp backward agrees with differentiating the XLA op."""
    rng = np.random.default_rng(1)
    B, T, H, D = 1, 64, 2, 32
    q = jnp.asarray(rng.standard_normal((B, T, H, D), np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, H, D), np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, H, D), np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(ops.scaled_dot_product_attention(
            q, k, v, is_causal=True) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 5e-2
