"""Pallas fused NT-Xent kernel vs the XLA implementation (interpret mode
on CPU; the same kernel compiles for TPU via mosaic)."""

import numpy as np

import jax
import jax.numpy as jnp

from sm3x.ops.ntxent import ntxent_loss
from sm3x.ops.ntxent_pallas import ntxent_loss_pallas


def test_pallas_forward_matches_xla(rng_np):
    b, d, t = 16, 32, 0.1
    z1 = jnp.asarray(rng_np.normal(size=(b, d)).astype(np.float32))
    z2 = jnp.asarray(rng_np.normal(size=(b, d)).astype(np.float32))
    want = float(ntxent_loss(z1, z2, t))
    got = float(ntxent_loss_pallas(z1, z2, t, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_gradient_matches_xla(rng_np):
    b, d, t = 8, 16, 0.5
    z1 = jnp.asarray(rng_np.normal(size=(b, d)).astype(np.float32))
    z2 = jnp.asarray(rng_np.normal(size=(b, d)).astype(np.float32))
    g_want = jax.grad(lambda a, c: ntxent_loss(a, c, t), argnums=(0, 1))(z1, z2)
    g_got = jax.grad(
        lambda a, c: ntxent_loss_pallas(a, c, t, True), argnums=(0, 1))(z1, z2)
    for got, want in zip(g_got, g_want):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6)
