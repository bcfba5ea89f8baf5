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
from typing import Tuple

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


def _resample_matrix(n_in: int, n_out: int, crop_start, crop_size, antialias):
    """(n_out, n_in) bilinear resampling weights for one axis: output pixel
    o samples source coordinate crop_start + (o+0.5)*crop_size/n_out - 0.5
    with a triangle kernel widened by the downscale factor when
    antialias=True (the same filter jax.image/PIL use). Built from iota +
    elementwise ops — the actual resize is then a dense matmul on the MXU
    instead of per-sample gathers, which is the difference between ~100
    and >10^5 images/sec on TPU."""
    crop_size = jnp.asarray(crop_size, jnp.float32)
    crop_start = jnp.asarray(crop_start, jnp.float32)
    scale = crop_size / n_out
    support = jnp.maximum(scale, 1.0) if antialias else 1.0
    o = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 0)
    i = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 1)
    src = crop_start + (o + 0.5) * scale - 0.5
    w = jnp.maximum(0.0, 1.0 - jnp.abs(i - src) / support)
    # confine the filter to the crop window: source pixels outside
    # [crop_start, crop_start+crop_size) get zero weight and the row
    # renormalizes — the clamp-to-edge semantics of PIL/torch resize on a
    # PRE-cropped image. Without this, crop-edge outputs bleed letterbox
    # padding (or out-of-crop content) into the result, which diverges
    # from the reference's crop-then-resize by up to whole intensity
    # levels when the valid region is small.
    inside = (i >= crop_start - 0.5) & (i <= crop_start + crop_size - 0.5)
    w = jnp.where(inside, w, 0.0)
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-8)


def _crop_resize_one(img, y0, x0, ch, cw, out_size, antialias):
    """Resize the [y0:y0+ch, x0:x0+cw) window to out_size: two dense
    matmuls per image (separable bilinear), vmapped into batched MXU
    matmuls with per-sample weight matrices."""
    oh, ow = out_size
    h, w, _ = img.shape
    wy = _resample_matrix(h, oh, y0, ch, antialias)          # (oh, h)
    wx = _resample_matrix(w, ow, x0, cw, antialias)          # (ow, w)
    tmp = jnp.einsum("oh,hwc->owc", wy, img,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("pw,owc->opc", wx, tmp,
                      preferred_element_type=jnp.float32)


def _resize_one(img, out_size, antialias=True):
    h, w, _ = img.shape
    return _crop_resize_one(img, 0.0, 0.0, float(h), float(w), out_size, antialias)


# ----------------------------------------------------------------------------
# ColorJitter (torchvision semantics on [0,1] floats)
# ----------------------------------------------------------------------------

_GRAY_W = jnp.array([0.299, 0.587, 0.114], jnp.float32)  # ITU-R 601-2


def _batch_adjust_brightness(x, f):
    return jnp.clip(x * f, 0.0, 1.0)


def _batch_adjust_contrast(x, f):
    mean = jnp.mean(jnp.sum(x * _GRAY_W, axis=-1), axis=(1, 2))[:, None, None, None]
    return jnp.clip(x * f + (1.0 - f) * mean, 0.0, 1.0)


def _batch_adjust_saturation(x, f):
    gray = jnp.sum(x * _GRAY_W, axis=-1, keepdims=True)
    return jnp.clip(x * f + (1.0 - f) * gray, 0.0, 1.0)


def _batch_adjust_hue(x, f):
    """Branch-free HSV hue rotation: h += f (mod 1), reconstructed with the
    standard k-offset formula (no per-pixel switch/choose — those lower to
    catastrophic per-element code on TPU)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    delta = maxc - minc
    safe = jnp.where(delta == 0.0, 1.0, delta)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta == 0.0, 0.0, h / 6.0) % 1.0
    s = jnp.where(maxc == 0.0, 0.0, delta / jnp.where(maxc == 0.0, 1.0, maxc))
    v = maxc

    h = (h + f[..., 0]) % 1.0

    def comp(n):
        k = (n + h * 6.0) % 6.0
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([comp(5.0), comp(3.0), comp(1.0)], axis=-1)


def _batch_color_jitter(rng, x, cfg: AugConfig):
    """torchvision ColorJitter distribution, batch-vectorized: per-sample
    factors + per-sample random op ORDER, realized as 4 rounds of
    4 whole-batch ops + a one-hot select (16 fused elementwise programs —
    vs. per-sample lax.switch under vmap, which ran ~5000x slower)."""
    bj, cj, sj, hj = cfg.jitter
    b = x.shape[0]
    k = jax.random.split(rng, 5)
    shape = (b, 1, 1, 1)
    fb = jax.random.uniform(k[0], shape, minval=max(0.0, 1 - bj), maxval=1 + bj)
    fc = jax.random.uniform(k[1], shape, minval=max(0.0, 1 - cj), maxval=1 + cj)
    fs = jax.random.uniform(k[2], shape, minval=max(0.0, 1 - sj), maxval=1 + sj)
    fh = jax.random.uniform(k[3], shape, minval=-hj, maxval=hj)
    # per-sample permutation of the 4 ops via argsort of iid uniforms
    order = jnp.argsort(jax.random.uniform(k[4], (b, 4)), axis=1)  # (B, 4)

    for t in range(4):
        idx = order[:, t][:, None, None, None]
        outs = (
            _batch_adjust_brightness(x, fb),
            _batch_adjust_contrast(x, fc),
            _batch_adjust_saturation(x, fs),
            _batch_adjust_hue(x, fh),
        )
        x = jnp.where(idx == 0, outs[0],
                      jnp.where(idx == 1, outs[1],
                                jnp.where(idx == 2, outs[2], outs[3])))
    return x


# ----------------------------------------------------------------------------
# GaussianBlur 3x3 with per-sample sigma (batch level)
# ----------------------------------------------------------------------------

def _batch_gaussian_blur3(x, sigma):
    """3x3 separable Gaussian, reflect padding (torchvision semantics),
    per-sample sigma (B, 1): 2 x 3 shifted adds on the whole batch."""
    offs = jnp.array([-1.0, 0.0, 1.0])
    w = jnp.exp(-0.5 * jnp.square(offs[None, :] / sigma))  # (B, 3)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    wb = w[:, :, None, None, None]

    def conv_axis(a, axis):
        lo = jnp.take(a, jnp.array([1]), axis=axis)       # reflect
        hi = jnp.take(a, jnp.array([a.shape[axis] - 2]), axis=axis)
        padded = jnp.concatenate([lo, a, hi], axis=axis)
        n = a.shape[axis]
        sl = lambda s: jax.lax.dynamic_slice_in_dim(padded, s, n, axis)
        return wb[:, 0] * sl(0) + wb[:, 1] * sl(1) + wb[:, 2] * sl(2)

    return conv_axis(conv_axis(x, 1), 2)


# ----------------------------------------------------------------------------
# Batched pipelines
# ----------------------------------------------------------------------------

def normalize_images(img, mean, std):
    """(x - mean) / std on [0,1] floats; NHWC."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img - mean) / std


def _batch_crop_resize(rng, canvases, valid_hw, cfg: AugConfig):
    """Per-sample RRC boxes + matmul resize, vmapped (the ONLY per-sample
    stage — everything downstream is whole-batch vectorized)."""
    b = canvases.shape[0]
    keys = jax.random.split(rng, b)

    def one(k, canvas, v):
        img = canvas.astype(jnp.float32) / 255.0
        h = v[0].astype(jnp.float32)
        w = v[1].astype(jnp.float32)
        if cfg.rrc:
            y0, x0, ch, cw = _sample_rrc_box(k, h, w, cfg)
            return _crop_resize_one(img, y0, x0, ch, cw, cfg.out_size,
                                    cfg.antialias)
        return _crop_resize_one(img, 0.0, 0.0, h, w, cfg.out_size, cfg.antialias)

    return jnp.clip(jax.vmap(one)(keys, canvases, valid_hw), 0.0, 1.0)


@partial(jax.jit, static_argnames=("cfg",))
def ssl_augment_batch(rng, canvases, valid_hw, mean, std, cfg: AugConfig = SSL_AUG):
    """One augmented view per canvas. canvases (B, H, W, 3) uint8;
    valid_hw (B, 2) int32. Returns (B, oh, ow, 3) f32 normalized."""
    b = canvases.shape[0]
    k_crop, k_jit, k_jp, k_gp, k_fp, k_bp, k_bs = jax.random.split(rng, 7)

    x = _batch_crop_resize(k_crop, canvases, valid_hw, cfg)

    if cfg.jitter_p > 0:
        do = jax.random.uniform(k_jp, (b, 1, 1, 1)) < cfg.jitter_p
        x = jnp.where(do, _batch_color_jitter(k_jit, x, cfg), x)

    if cfg.grayscale_p > 0:
        do = jax.random.uniform(k_gp, (b, 1, 1, 1)) < cfg.grayscale_p
        gray = jnp.sum(x * _GRAY_W, axis=-1, keepdims=True)
        x = jnp.where(do, jnp.broadcast_to(gray, x.shape), x)

    if cfg.flip_p > 0:
        do = jax.random.uniform(k_fp, (b, 1, 1, 1)) < cfg.flip_p
        x = jnp.where(do, x[:, :, ::-1, :], x)

    if cfg.blur_p > 0:
        do = jax.random.uniform(k_bp, (b, 1, 1, 1)) < cfg.blur_p
        sigma = jax.random.uniform(
            k_bs, (b, 1), minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1])
        x = jnp.where(do, _batch_gaussian_blur3(x, sigma), x)

    return normalize_images(x, mean, std)


@partial(jax.jit, static_argnames=("cfg",))
def supervised_augment_batch(rng, canvases, valid_hw, mean, std, cfg: AugConfig = FINETUNE_AUG):
    return ssl_augment_batch(rng, canvases, valid_hw, mean, std, cfg)


def modality_keys(kd, kc, joint_aug: bool = False):
    """Select per-modality augmentation RNG keys: (k_derm, k_clinic).

    `joint_aug=True` reproduces SevenPCBaseDataset2 (reference
    datasets.py:573-605): ONE transform call over the stacked derm+clinic
    tensor gives the pair identical random parameters — crop box, flip,
    jitter factors, blur sigma — realized here by handing both modalities
    the derm key (every per-sample/per-view draw downstream is then
    bitwise identical). Default is the independent-params semantics of
    SevenPCBaseDataset (datasets.py:477-570: one transform call per
    modality), with the caller's original key split preserved."""
    return (kd, kd) if joint_aug else (kd, kc)


def modality_valid_hw(derm_hw, clinic_hw, joint_aug: bool = False):
    """Per-modality valid crop regions. SevenPCBaseDataset2 truncates both
    images to the common (min h, min w) before stacking them for the joint
    transform (reference datasets.py:586-591), so under `joint_aug=True`
    both modalities crop within the shared region — which also makes the
    sampled crop boxes bitwise equal given the shared key."""
    if not joint_aug:
        return derm_hw, clinic_hw
    hw = jnp.minimum(derm_hw, clinic_hw)
    return hw, hw


def get_ssl_augment_fn(use_pallas: bool = False, mesh=None):
    """Pick the augmentation implementation for a train step: the XLA
    chain, or the fused Pallas photometric kernel (shard_map-wrapped on a
    data-sharded mesh). Same sampling distributions either way."""
    if use_pallas:
        from sm3x.ops.augment_pallas import ssl_augment_batch_fused

        return partial(ssl_augment_batch_fused, mesh=mesh)
    return ssl_augment_batch


def multicrop_augment_batch(rng, canvases, valid_hw, mean, std,
                            size_crops=(224, 96), nmb_crops=(2, 6),
                            min_scale_crops=(0.5, 0.14),
                            max_scale_crops=(1.0, 0.5),
                            base_cfg: AugConfig = SSL_AUG,
                            aug_fn=None):
    """SwAV-style multi-crop (reference SevenPCSwavDataset,
    datasets.py:608-679): nmb_crops[i] views at resolution size_crops[i]
    with per-resolution RRC scale ranges. Returns a list of augmented
    view batches grouped by resolution (the SSL trainer consumes this for
    --data-name SevenPCSwavDataset). `aug_fn` selects the augmentation
    implementation (default: the XLA chain; pass the Pallas-fused fn from
    get_ssl_augment_fn to match --use-pallas-augment)."""
    aug_fn = aug_fn or ssl_augment_batch
    views = []
    idx = 0
    for size, n, lo, hi in zip(size_crops, nmb_crops, min_scale_crops,
                               max_scale_crops):
        cfg = dataclasses.replace(
            base_cfg, out_size=(size, size), rrc_scale=(lo, hi))
        for _ in range(n):
            k = jax.random.fold_in(rng, idx)
            views.append(aug_fn(k, canvases, valid_hw, mean, std, cfg))
            idx += 1
    return views


@partial(jax.jit, static_argnames=("out_size",))
def eval_resize_batch(canvases, valid_hw, mean, std, out_size=(224, 224)):
    """Deterministic eval path: Resize(out) + Normalize (mlc_eval.py:302-308).
    Letterboxed canvases are resized from their valid region."""
    def one(c, v):
        img = c.astype(jnp.float32) / 255.0
        return _crop_resize_one(
            img, 0.0, 0.0, v[0].astype(jnp.float32), v[1].astype(jnp.float32),
            out_size, antialias=True)

    out = jax.vmap(one)(canvases, valid_hw)
    out = jnp.clip(out, 0.0, 1.0)
    return normalize_images(out, mean, std)


def normalize_uint8(x, mean, std):
    """uint8 NHWC batch -> normalized float (the reference Normalizer.fit,
    misc.py:80-100, albumentations-style: (x - 255*mean) * 1/(255*std))."""
    x = jnp.asarray(x, jnp.float32) / 255.0
    return normalize_images(x, mean, std)


def denormalize_to_uint8(x, mean, std):
    """Inverse of normalize (Normalizer.denormalize, misc.py:102-104)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return jnp.clip((x * std + mean) * 255.0, 0, 255).astype(jnp.uint8)
