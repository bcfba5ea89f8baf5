"""On-device fused image augmentation.

The reference decodes JPEGs with OpenCV and runs torchvision CPU
transforms inside DataLoader worker processes
(/root/reference/tools/backbone_train.py:448-466,
 /root/reference/src/utils/data/functional.py:30-49). That CPU pipeline is
the throughput ceiling of the whole SSL stage. Here the host only decodes
(once, into a cached uint8 canvas); every random transform runs on the
TPU as one jit-compiled batched program:

    uint8 canvas (B, H, W, 3)
      -> RandomResizedCrop   (per-sample scale/translate matmuls, MXU)
      -> ColorJitter         (p, random order of brightness/contrast/
                              saturation/hue — VPU elementwise)
      -> RandomGrayscale
      -> RandomHorizontalFlip
      -> GaussianBlur 3x3    (9 shifted adds with per-sample sigma)
      -> Normalize           (mean/std)
      -> float NHWC batch in HBM, ready for the encoder

Distributions (not bitwise RNG) match torchvision's samplers: RRC's
log-uniform aspect in [3/4, 4/3] with uniform area scale and 10-attempt
rejection -> center fallback; ColorJitter factors uniform around 1 (hue
additive), applied in a random operation order. SURVEY §7 "fused
augmentation correctness" names these as the distributions to preserve.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugConfig:
    out_size: Tuple[int, int] = (224, 224)
    # RandomResizedCrop
    rrc: bool = True
    rrc_scale: Tuple[float, float] = (0.5, 1.0)
    rrc_ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)
    # ColorJitter(brightness, contrast, saturation, hue) @ p
    jitter_p: float = 0.8
    jitter: Tuple[float, float, float, float] = (0.8, 0.8, 0.8, 0.2)
    grayscale_p: float = 0.2
    flip_p: float = 0.5
    # GaussianBlur 3x3, sigma ~ U[lo, hi] @ p
    blur_p: float = 0.5
    blur_sigma: Tuple[float, float] = (0.1, 2.0)
    antialias: bool = True


# The reference's SSL recipe (backbone_train.py:448-466)
SSL_AUG = AugConfig()
# mlc_train.py:309-325: RRC(0.5-1.0) + jitter@0.5 + flip, no gray/blur
MLC_TRAIN_AUG = AugConfig(jitter_p=0.5, grayscale_p=0.0, blur_p=0.0)
# mlc_eval.py:294-301 train: RRC(0.3-1.0) + flip only
FINETUNE_AUG = AugConfig(rrc_scale=(0.3, 1.0), jitter_p=0.0, grayscale_p=0.0, blur_p=0.0)
# linear probing (backbone_train.py:302-309): RRC(0.5-1.0) + flip only
PROBE_AUG = AugConfig(jitter_p=0.0, grayscale_p=0.0, blur_p=0.0)


# ----------------------------------------------------------------------------
# RandomResizedCrop
# ----------------------------------------------------------------------------

def _sample_rrc_box(rng, h, w, cfg: AugConfig):
    """torchvision RandomResizedCrop.get_params: 10 uniform attempts over
    (area-scale, log-aspect); first attempt that fits wins; otherwise a
    center crop clamped to the valid ratio range. h, w may be traced."""
    area = (h * w).astype(jnp.float32) if hasattr(h, "dtype") else float(h * w)
    h = jnp.asarray(h, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    area = h * w
    log_r0, log_r1 = jnp.log(cfg.rrc_ratio[0]), jnp.log(cfg.rrc_ratio[1])

    k_scale, k_ratio = jax.random.split(rng)
    scales = jax.random.uniform(
        k_scale, (10,), minval=cfg.rrc_scale[0], maxval=cfg.rrc_scale[1]
    )
    ratios = jnp.exp(jax.random.uniform(k_ratio, (10,), minval=log_r0, maxval=log_r1))
    target_area = area * scales
    cw = jnp.round(jnp.sqrt(target_area * ratios))
    ch = jnp.round(jnp.sqrt(target_area / ratios))
    ok = (cw > 0) & (cw <= w) & (ch > 0) & (ch <= h)
    first = jnp.argmax(ok)  # index of first success (0 if none — guarded below)
    any_ok = jnp.any(ok)

    # fallback: center crop at clamped aspect (torchvision's else-branch)
    in_ratio = w / h
    fw = jnp.where(in_ratio < cfg.rrc_ratio[0], w,
                   jnp.where(in_ratio > cfg.rrc_ratio[1], jnp.round(h * cfg.rrc_ratio[1]), w))
    fh = jnp.where(in_ratio < cfg.rrc_ratio[0], jnp.round(w / cfg.rrc_ratio[0]),
                   jnp.where(in_ratio > cfg.rrc_ratio[1], h, h))

    ch_sel = jnp.where(any_ok, ch[first], fh)
    cw_sel = jnp.where(any_ok, cw[first], fw)

    # offsets: torchvision uses randint(0, h - ch + 1); fallback is centered
    k_i, k_j = jax.random.split(jax.random.fold_in(rng, 1))
    u_i = jax.random.uniform(k_i)
    u_j = jax.random.uniform(k_j)
    i_rand = jnp.floor(u_i * (h - ch_sel + 1.0))
    j_rand = jnp.floor(u_j * (w - cw_sel + 1.0))
    i_center = jnp.round((h - ch_sel) / 2.0)
    j_center = jnp.round((w - cw_sel) / 2.0)
    y0 = jnp.where(any_ok, i_rand, i_center)
    x0 = jnp.where(any_ok, j_rand, j_center)
    return y0, x0, ch_sel, cw_sel


def _crop_resize_one(img, y0, x0, ch, cw, out_size, antialias):
    """Resize the [y0:y0+ch, x0:x0+cw] window to out_size with bilinear
    (antialiased) sampling. Per-sample scale/translate lower to two small
    dense matmuls per image — MXU work, no dynamic shapes."""
    oh, ow = out_size
    scale = jnp.stack([oh / ch, ow / cw])
    translation = jnp.stack([-y0 * oh / ch, -x0 * ow / cw])
    return jax.image.scale_and_translate(
        img,
        shape=(oh, ow, img.shape[-1]),
        spatial_dims=(0, 1),
        scale=scale.astype(jnp.float32),
        translation=translation.astype(jnp.float32),
        method="linear",
        antialias=antialias,
    )


def _resize_one(img, out_size, antialias=True):
    oh, ow = out_size
    h, w, c = img.shape
    return jax.image.resize(img, (oh, ow, c), method="linear", antialias=antialias)


# ----------------------------------------------------------------------------
# ColorJitter (torchvision semantics on [0,1] floats)
# ----------------------------------------------------------------------------

_GRAY_W = jnp.array([0.299, 0.587, 0.114], jnp.float32)  # ITU-R 601-2


def _to_gray(img):
    return jnp.sum(img * _GRAY_W, axis=-1, keepdims=True)


def _adjust_brightness(img, f):
    return jnp.clip(img * f, 0.0, 1.0)


def _adjust_contrast(img, f):
    # torchvision: blend with the mean of the grayscale image
    mean = jnp.mean(_to_gray(img))
    return jnp.clip(img * f + (1.0 - f) * mean, 0.0, 1.0)


def _adjust_saturation(img, f):
    gray = _to_gray(img)
    return jnp.clip(img * f + (1.0 - f) * gray, 0.0, 1.0)


def _adjust_hue(img, f):
    """Shift hue by f (fraction of a turn) via RGB->HSV->RGB."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    delta = maxc - minc
    safe = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta == 0, 0.0, h / 6.0) % 1.0

    h = (h + f) % 1.0

    i = jnp.floor(h * 6.0)
    frac = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * frac)
    t = v * (1.0 - s * (1.0 - frac))
    i = i.astype(jnp.int32) % 6
    r2 = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g2 = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b2 = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r2, g2, b2], axis=-1)


def _color_jitter(rng, img, cfg: AugConfig):
    """Random-order brightness/contrast/saturation/hue, torchvision-style."""
    bj, cj, sj, hj = cfg.jitter
    k = jax.random.split(rng, 5)
    fb = jax.random.uniform(k[0], minval=max(0.0, 1 - bj), maxval=1 + bj)
    fc = jax.random.uniform(k[1], minval=max(0.0, 1 - cj), maxval=1 + cj)
    fs = jax.random.uniform(k[2], minval=max(0.0, 1 - sj), maxval=1 + sj)
    fh = jax.random.uniform(k[3], minval=-hj, maxval=hj)
    order = jax.random.permutation(k[4], 4)

    def apply_op(img, op_idx):
        return jax.lax.switch(
            op_idx,
            [
                lambda x: _adjust_brightness(x, fb),
                lambda x: _adjust_contrast(x, fc),
                lambda x: _adjust_saturation(x, fs),
                lambda x: _adjust_hue(x, fh),
            ],
            img,
        )

    def body(i, x):
        return apply_op(x, order[i])

    return jax.lax.fori_loop(0, 4, body, img)


# ----------------------------------------------------------------------------
# GaussianBlur 3x3 with per-sample sigma
# ----------------------------------------------------------------------------

def _gaussian_blur3(img, sigma):
    """3x3 separable Gaussian with reflect padding (torchvision pads
    reflect). Implemented as 2 x 3 shifted adds — fuses on the VPU."""
    x = jnp.array([-1.0, 0.0, 1.0])
    w = jnp.exp(-0.5 * jnp.square(x / sigma))
    w = w / jnp.sum(w)

    def conv1d(a, axis):
        lo = jnp.take(a, jnp.array([1]), axis=axis)  # reflect
        hi = jnp.take(a, jnp.array([a.shape[axis] - 2]), axis=axis)
        padded = jnp.concatenate([lo, a, hi], axis=axis)
        n = a.shape[axis]
        sl = lambda s: jax.lax.dynamic_slice_in_dim(padded, s, n, axis)
        return w[0] * sl(0) + w[1] * sl(1) + w[2] * sl(2)

    return conv1d(conv1d(img, 0), 1)


# ----------------------------------------------------------------------------
# Batched pipelines
# ----------------------------------------------------------------------------

def _augment_one(rng, canvas, valid_hw, cfg: AugConfig):
    """canvas: (H, W, 3) uint8; valid_hw: (2,) int32 live region (the host
    cache letterboxes non-square images — crops sample inside it)."""
    keys = jax.random.split(rng, 6)
    h = valid_hw[0].astype(jnp.float32)
    w = valid_hw[1].astype(jnp.float32)

    img = canvas.astype(jnp.float32) / 255.0

    if cfg.rrc:
        y0, x0, ch, cw = _sample_rrc_box(keys[0], h, w, cfg)
        img = _crop_resize_one(img, y0, x0, ch, cw, cfg.out_size, cfg.antialias)
    else:
        img = _resize_one(img, cfg.out_size, cfg.antialias)
    img = jnp.clip(img, 0.0, 1.0)

    if cfg.jitter_p > 0:
        do = jax.random.uniform(keys[1]) < cfg.jitter_p
        img = jnp.where(do, _color_jitter(jax.random.fold_in(keys[1], 1), img, cfg), img)

    if cfg.grayscale_p > 0:
        do = jax.random.uniform(keys[2]) < cfg.grayscale_p
        gray = jnp.broadcast_to(_to_gray(img), img.shape)
        img = jnp.where(do, gray, img)

    if cfg.flip_p > 0:
        do = jax.random.uniform(keys[3]) < cfg.flip_p
        img = jnp.where(do, img[:, ::-1, :], img)

    if cfg.blur_p > 0:
        do = jax.random.uniform(keys[4]) < cfg.blur_p
        sigma = jax.random.uniform(
            keys[5], minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1]
        )
        img = jnp.where(do, _gaussian_blur3(img, sigma), img)

    return img


def normalize_images(img, mean, std):
    """(x - mean) / std on [0,1] floats; NHWC."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img - mean) / std


@partial(jax.jit, static_argnames=("cfg",))
def ssl_augment_batch(rng, canvases, valid_hw, mean, std, cfg: AugConfig = SSL_AUG):
    """One augmented view per canvas. canvases (B, H, W, 3) uint8;
    valid_hw (B, 2) int32. Returns (B, oh, ow, 3) f32 normalized."""
    b = canvases.shape[0]
    keys = jax.random.split(rng, b)
    out = jax.vmap(lambda k, c, v: _augment_one(k, c, v, cfg))(keys, canvases, valid_hw)
    return normalize_images(out, mean, std)


@partial(jax.jit, static_argnames=("cfg",))
def supervised_augment_batch(rng, canvases, valid_hw, mean, std, cfg: AugConfig = FINETUNE_AUG):
    return ssl_augment_batch(rng, canvases, valid_hw, mean, std, cfg)


@partial(jax.jit, static_argnames=("out_size",))
def eval_resize_batch(canvases, valid_hw, mean, std, out_size=(224, 224)):
    """Deterministic eval path: Resize(out) + Normalize (mlc_eval.py:302-308).
    Letterboxed canvases are resized from their valid region."""
    def one(c, v):
        img = c.astype(jnp.float32) / 255.0
        oh, ow = out_size
        scale = jnp.stack([oh / v[0].astype(jnp.float32), ow / v[1].astype(jnp.float32)])
        return jax.image.scale_and_translate(
            img, (oh, ow, c.shape[-1]), (0, 1),
            scale=scale, translation=jnp.zeros(2, jnp.float32),
            method="linear", antialias=True,
        )

    out = jax.vmap(one)(canvases, valid_hw)
    out = jnp.clip(out, 0.0, 1.0)
    return normalize_images(out, mean, std)
