"""Property tests locking the augmentation semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sm3x.ops.augment as A

MEAN = (0.0, 0.0, 0.0)
STD = (1.0, 1.0, 1.0)


def _canvases(b=4, s=64, seed=0):
    rng = np.random.default_rng(seed)
    canv = rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8)
    hw = np.full((b, 2), s, np.int32)
    return jnp.asarray(canv), jnp.asarray(hw)


def test_no_op_config_is_plain_resize():
    canv, hw = _canvases()
    cfg = A.AugConfig(rrc=False, jitter_p=0, grayscale_p=0, flip_p=0, blur_p=0,
                      out_size=(32, 32))
    a = A.ssl_augment_batch(jax.random.key(0), canv, hw, MEAN, STD, cfg)
    b = A.eval_resize_batch(canv, hw, MEAN, STD, (32, 32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_grayscale_has_equal_channels():
    canv, hw = _canvases()
    cfg = A.AugConfig(rrc=False, jitter_p=0, grayscale_p=1.0, flip_p=0,
                      blur_p=0, out_size=(32, 32))
    out = np.asarray(A.ssl_augment_batch(jax.random.key(0), canv, hw,
                                         MEAN, STD, cfg))
    np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-6)
    np.testing.assert_allclose(out[..., 1], out[..., 2], atol=1e-6)


def test_flip_p1_reverses_width():
    canv, hw = _canvases()
    base = A.AugConfig(rrc=False, jitter_p=0, grayscale_p=0, flip_p=0,
                       blur_p=0, out_size=(32, 32))
    flip = A.AugConfig(rrc=False, jitter_p=0, grayscale_p=0, flip_p=1.0,
                       blur_p=0, out_size=(32, 32))
    a = np.asarray(A.ssl_augment_batch(jax.random.key(0), canv, hw, MEAN, STD, base))
    b = np.asarray(A.ssl_augment_batch(jax.random.key(0), canv, hw, MEAN, STD, flip))
    np.testing.assert_allclose(b, a[:, :, ::-1, :], atol=1e-6)


def test_identity_jitter_factors_change_nothing():
    canv, hw = _canvases()
    base = A.AugConfig(rrc=False, jitter_p=0, grayscale_p=0, flip_p=0,
                       blur_p=0, out_size=(32, 32))
    # strength-0 jitter: factors are exactly 1 / hue shift 0
    jit = A.AugConfig(rrc=False, jitter_p=1.0, jitter=(0.0, 0.0, 0.0, 0.0),
                      grayscale_p=0, flip_p=0, blur_p=0, out_size=(32, 32))
    a = np.asarray(A.ssl_augment_batch(jax.random.key(0), canv, hw, MEAN, STD, base))
    b = np.asarray(A.ssl_augment_batch(jax.random.key(0), canv, hw, MEAN, STD, jit))
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_hue_full_turn_is_identity():
    from sm3x.ops.augment import _batch_adjust_hue

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    y0 = _batch_adjust_hue(x, jnp.zeros((2, 1, 1, 1)))
    y1 = _batch_adjust_hue(x, jnp.ones((2, 1, 1, 1)))  # +1.0 == full turn
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(x), atol=1e-5)


def test_hue_matches_colorsys_oracle():
    import colorsys

    from sm3x.ops.augment import _batch_adjust_hue

    rng = np.random.default_rng(2)
    x = rng.random((1, 4, 4, 3)).astype(np.float32)
    shift = 0.13
    got = np.asarray(_batch_adjust_hue(jnp.asarray(x),
                                       jnp.full((1, 1, 1, 1), shift)))
    for i in range(4):
        for j in range(4):
            r, g, b = x[0, i, j]
            h, s, v = colorsys.rgb_to_hsv(r, g, b)
            want = colorsys.hsv_to_rgb((h + shift) % 1.0, s, v)
            np.testing.assert_allclose(got[0, i, j], want, atol=1e-4)


def test_blur_preserves_mean_and_smooths():
    from sm3x.ops.augment import _batch_gaussian_blur3

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    y = _batch_gaussian_blur3(x, jnp.full((2, 1), 1.0))
    # mean preserved (kernel sums to 1, reflect padding)
    np.testing.assert_allclose(float(jnp.mean(y)), float(jnp.mean(x)), atol=5e-3)
    # variance reduced
    assert float(jnp.var(y)) < float(jnp.var(x))


def test_multicrop_shapes():
    canv, hw = _canvases()
    views = A.multicrop_augment_batch(
        jax.random.key(0), canv, hw, MEAN, STD,
        size_crops=(32, 16), nmb_crops=(2, 3))
    assert len(views) == 5
    assert views[0].shape == (4, 32, 32, 3)
    assert views[-1].shape == (4, 16, 16, 3)
