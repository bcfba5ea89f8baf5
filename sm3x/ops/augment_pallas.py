"""Pallas TPU kernel: fused photometric augmentation chain.

The XLA pipeline in sm3x.ops.augment runs the ColorJitter rounds as 16
whole-batch elementwise programs plus grayscale/flip/blur/normalize —
each materializing a (B, H, W, 3) float through HBM. This kernel runs the
ENTIRE photometric chain for one image per grid step inside VMEM
(224x224x3 f32 = 600 KB << 16 MB), so each pixel is read from and
written to HBM exactly once.

Per-image parameters (jitter factors, op order, apply-flags, blur sigma)
arrive as a (B, 16) array; the geometry stage (crop + matmul-form
resize) stays in XLA where the MXU already handles it.

Layout note: the kernel operates on (3, H, W) planes (channel-major) so
the channel reductions (gray/max/min) are plane arithmetic instead of
lane-dim reductions; the caller transposes around the call — two cheap
transposes vs 16 HBM round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# params vector layout (per image)
P_FB, P_FC, P_FS, P_FH = 0, 1, 2, 3          # jitter factors
P_ORD0, P_ORD1, P_ORD2, P_ORD3 = 4, 5, 6, 7  # op order (0..3 as floats)
P_DO_JIT, P_DO_GRAY, P_DO_FLIP, P_DO_BLUR = 8, 9, 10, 11
P_SIGMA = 12
P_SIZE = 16

_GR, _GG, _GB = 0.299, 0.587, 0.114


def _gray(r, g, b):
    return _GR * r + _GG * g + _GB * b


def _hue_rotate(r, g, b, f):
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
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
    h = (h + f) % 1.0

    def comp(n):
        k = (n + h * 6.0) % 6.0
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return comp(5.0), comp(3.0), comp(1.0)


def _photometric_kernel(params_ref, img_ref, out_ref, *, mean, std):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    # SMEM allows scalar loads only — pull each parameter individually
    p = {k: params_ref[i, k] for k in
         (P_FB, P_FC, P_FS, P_FH, P_ORD0, P_ORD1, P_ORD2, P_ORD3,
          P_DO_JIT, P_DO_GRAY, P_DO_FLIP, P_DO_BLUR, P_SIGMA)}
    r = img_ref[0, 0]
    g = img_ref[0, 1]
    b = img_ref[0, 2]

    def jitter_round(op, rgb):
        r, g, b = rgb

        def brightness(r, g, b):
            f = p[P_FB]
            return (jnp.clip(r * f, 0., 1.), jnp.clip(g * f, 0., 1.),
                    jnp.clip(b * f, 0., 1.))

        def contrast(r, g, b):
            f = p[P_FC]
            m = jnp.mean(_gray(r, g, b))
            return (jnp.clip(r * f + (1 - f) * m, 0., 1.),
                    jnp.clip(g * f + (1 - f) * m, 0., 1.),
                    jnp.clip(b * f + (1 - f) * m, 0., 1.))

        def saturation(r, g, b):
            f = p[P_FS]
            gr = _gray(r, g, b)
            return (jnp.clip(r * f + (1 - f) * gr, 0., 1.),
                    jnp.clip(g * f + (1 - f) * gr, 0., 1.),
                    jnp.clip(b * f + (1 - f) * gr, 0., 1.))

        def hue(r, g, b):
            return _hue_rotate(r, g, b, p[P_FH])

        return jax.lax.switch(
            op, [lambda t: brightness(*t), lambda t: contrast(*t),
                 lambda t: saturation(*t), lambda t: hue(*t)], (r, g, b))

    def with_jitter(rgb):
        for t in (P_ORD0, P_ORD1, P_ORD2, P_ORD3):
            rgb = jitter_round(p[t].astype(jnp.int32), rgb)
        return rgb

    rj, gj, bj = with_jitter((r, g, b))
    do_j = p[P_DO_JIT] > 0.5
    r = jnp.where(do_j, rj, r)
    g = jnp.where(do_j, gj, g)
    b = jnp.where(do_j, bj, b)

    do_gray = p[P_DO_GRAY] > 0.5
    gr = _gray(r, g, b)
    r = jnp.where(do_gray, gr, r)
    g = jnp.where(do_gray, gr, g)
    b = jnp.where(do_gray, gr, b)

    # Horizontal flip as an anti-diagonal permutation matmul: Pallas TPU
    # has no `rev` lowering, and the MXU makes a (W, W) permute free at
    # this size.
    wdim = r.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (wdim, wdim), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (wdim, wdim), 1)
    perm = (row + col == wdim - 1).astype(jnp.float32)

    def flip(x):
        return jnp.dot(x, perm, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    do_flip = p[P_DO_FLIP] > 0.5
    r = jnp.where(do_flip, flip(r), r)
    g = jnp.where(do_flip, flip(g), g)
    b = jnp.where(do_flip, flip(b), b)

    # 3x3 separable Gaussian, reflect padding
    sigma = p[P_SIGMA]
    w1 = jnp.exp(-0.5 / jnp.maximum(sigma * sigma, 1e-8))
    norm = 1.0 + 2.0 * w1
    w0, w1 = 1.0 / norm, w1 / norm

    def blur(x):
        up = jnp.concatenate([x[1:2], x[:-1]], axis=0)
        dn = jnp.concatenate([x[1:], x[-2:-1]], axis=0)
        x = w0 * x + w1 * (up + dn)
        lf = jnp.concatenate([x[:, 1:2], x[:, :-1]], axis=1)
        rt = jnp.concatenate([x[:, 1:], x[:, -2:-1]], axis=1)
        return w0 * x + w1 * (lf + rt)

    do_blur = p[P_DO_BLUR] > 0.5
    r = jnp.where(do_blur, blur(r), r)
    g = jnp.where(do_blur, blur(g), g)
    b = jnp.where(do_blur, blur(b), b)

    out_ref[0, 0] = (r - mean[0]) / std[0]
    out_ref[0, 1] = (g - mean[1]) / std[1]
    out_ref[0, 2] = (b - mean[2]) / std[2]


def photometric_pallas(images, params, mean, std, interpret: bool = False):
    """images (B, H, W, 3) f32 in [0,1]; params (B, 16) f32.
    Returns normalized (B, H, W, 3) f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, _ = images.shape
    planes = jnp.transpose(images, (0, 3, 1, 2))  # (B, 3, H, W)
    kern = functools.partial(_photometric_kernel,
                             mean=tuple(float(m) for m in mean),
                             std=tuple(float(s) for s in std))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # params land whole in SMEM
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
        interpret=interpret,
    )(params, planes)
    return jnp.transpose(out, (0, 2, 3, 1))


def ssl_augment_batch_fused(rng, canvases, valid_hw, mean, std, cfg=None,
                            interpret=None, mesh=None):
    """Drop-in alternative to sm3x.ops.augment.ssl_augment_batch: same
    distributions, but the photometric chain runs as one Pallas kernel
    (single HBM round-trip) instead of ~20 XLA elementwise programs.
    Geometry (RRC + matmul resize) stays in XLA.

    Pass `mesh` when the batch is sharded over a "data" axis: pallas_call
    is opaque to GSPMD (it would all-gather and replicate the kernel), so
    we shard_map it over the data axis — each shard runs its own grid."""
    from sm3x.ops import augment as A

    if cfg is None:
        cfg = A.SSL_AUG
    if interpret is None:  # interpret mode on CPU (tests / dryrun meshes)
        interpret = jax.default_backend() == "cpu"
    k_crop, k_params = jax.random.split(rng)
    x = A._batch_crop_resize(k_crop, canvases, valid_hw, cfg)
    params = build_params(k_params, x.shape[0], cfg)
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        from jax.sharding import PartitionSpec as P

        fn = jax.shard_map(
            functools.partial(photometric_pallas, mean=mean, std=std,
                              interpret=interpret),
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
            check_vma=False)  # pallas_call's ShapeDtypeStruct carries no vma
        return fn(x, params)
    return photometric_pallas(x, params, mean, std, interpret=interpret)


def build_params(rng, batch: int, cfg) -> jax.Array:
    """Sample the per-image parameter matrix (matches the XLA pipeline's
    distributions in sm3x.ops.augment)."""
    bj, cj, sj, hj = cfg.jitter
    k = jax.random.split(rng, 9)
    cols = [
        jax.random.uniform(k[0], (batch,), minval=max(0.0, 1 - bj), maxval=1 + bj),
        jax.random.uniform(k[1], (batch,), minval=max(0.0, 1 - cj), maxval=1 + cj),
        jax.random.uniform(k[2], (batch,), minval=max(0.0, 1 - sj), maxval=1 + sj),
        jax.random.uniform(k[3], (batch,), minval=-hj, maxval=hj),
    ]
    order = jnp.argsort(jax.random.uniform(k[4], (batch, 4)), axis=1)
    cols += [order[:, i].astype(jnp.float32) for i in range(4)]
    cols += [
        (jax.random.uniform(k[5], (batch,)) < cfg.jitter_p).astype(jnp.float32),
        (jax.random.uniform(k[6], (batch,)) < cfg.grayscale_p).astype(jnp.float32),
        (jax.random.uniform(k[7], (batch,)) < cfg.flip_p).astype(jnp.float32),
        (jax.random.uniform(k[8], (batch,)) < cfg.blur_p).astype(jnp.float32),
        jax.random.uniform(jax.random.fold_in(k[8], 1), (batch,),
                           minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1]),
    ]
    pad = jnp.zeros((batch, P_SIZE - len(cols)), jnp.float32)
    return jnp.concatenate([jnp.stack(cols, axis=1), pad], axis=1)
