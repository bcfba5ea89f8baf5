"""Weight-standardized convs (dormant parity layers)."""

import numpy as np

import jax
import jax.numpy as jnp

from sm3x.models.layers import ConvWS, ConvAWS, group_norm


def test_convws_shapes_and_standardization():
    m = ConvWS(features=8, kernel=(3, 3), strides=2)
    x = jnp.ones((2, 16, 16, 4), jnp.float32)
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 8, 8, 8)
    # the kernel actually used is standardized: recompute and check stats
    w = v["params"]["kernel"]
    ws = (w - w.mean(axis=(0, 1, 2), keepdims=True)) / (
        w.std(axis=(0, 1, 2), keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(ws).mean(axis=(0, 1, 2)), 0.0, atol=1e-6)


def test_convaws_params():
    m = ConvAWS(features=4, kernel=(1, 1))
    x = jnp.ones((1, 8, 8, 2), jnp.float32)
    v = m.init(jax.random.key(0), x)
    assert "ws_gamma" in v["params"] and "ws_beta" in v["params"]
    y = m.apply(v, x)
    assert y.shape == (1, 8, 8, 4)


def test_group_norm_helper():
    gn = group_norm(num_groups=2)
    x = jnp.ones((2, 4, 4, 8), jnp.float32)
    v = gn.init(jax.random.key(0), x)
    y = gn.apply(v, x)
    assert y.shape == x.shape
