"""Fused photometric Pallas kernel vs the XLA composition (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

import sm3x.ops.augment as A
from sm3x.ops.augment_pallas import (
    photometric_pallas, build_params,
    P_FB, P_FC, P_FS, P_FH, P_ORD0, P_DO_JIT, P_DO_GRAY, P_DO_FLIP,
    P_DO_BLUR, P_SIGMA, P_SIZE,
)

MEAN = (0.5, 0.45, 0.4)
STD = (0.25, 0.3, 0.2)


def xla_reference(images, params):
    """Compose the XLA pipeline pieces with explicit per-image params."""
    x = jnp.asarray(images)
    b = x.shape[0]
    p = np.asarray(params)
    fb = jnp.asarray(p[:, P_FB]).reshape(b, 1, 1, 1)
    fc = jnp.asarray(p[:, P_FC]).reshape(b, 1, 1, 1)
    fs = jnp.asarray(p[:, P_FS]).reshape(b, 1, 1, 1)
    fh = jnp.asarray(p[:, P_FH]).reshape(b, 1, 1, 1)
    order = p[:, P_ORD0:P_ORD0 + 4].astype(int)

    outs = []
    for i in range(b):
        xi = x[i:i + 1]
        if p[i, P_DO_JIT] > 0.5:
            for t in range(4):
                op = order[i, t]
                if op == 0:
                    xi = A._batch_adjust_brightness(xi, fb[i:i + 1])
                elif op == 1:
                    xi = A._batch_adjust_contrast(xi, fc[i:i + 1])
                elif op == 2:
                    xi = A._batch_adjust_saturation(xi, fs[i:i + 1])
                else:
                    xi = A._batch_adjust_hue(xi, fh[i:i + 1])
        if p[i, P_DO_GRAY] > 0.5:
            gray = jnp.sum(xi * A._GRAY_W, axis=-1, keepdims=True)
            xi = jnp.broadcast_to(gray, xi.shape)
        if p[i, P_DO_FLIP] > 0.5:
            xi = xi[:, :, ::-1, :]
        if p[i, P_DO_BLUR] > 0.5:
            xi = A._batch_gaussian_blur3(
                xi, jnp.asarray(p[i:i + 1, P_SIGMA:P_SIGMA + 1]))
        outs.append(xi)
    return A.normalize_images(jnp.concatenate(outs), MEAN, STD)


def test_kernel_matches_xla_composition(rng_np):
    b, h, w = 4, 16, 16
    images = rng_np.random((b, h, w, 3)).astype(np.float32)
    params = np.array(build_params(jax.random.key(0), b, A.SSL_AUG))
    # force a mix of on/off flags deterministically
    params[:, P_DO_JIT] = [1, 1, 0, 1]
    params[:, P_DO_GRAY] = [0, 1, 0, 0]
    params[:, P_DO_FLIP] = [1, 0, 0, 1]
    params[:, P_DO_BLUR] = [0, 1, 1, 0]

    want = np.asarray(xla_reference(images, params))
    got = np.asarray(photometric_pallas(
        jnp.asarray(images), jnp.asarray(params), MEAN, STD, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_build_params_shapes():
    p = build_params(jax.random.key(1), 8, A.SSL_AUG)
    assert p.shape == (8, P_SIZE)
    order = np.asarray(p[:, P_ORD0:P_ORD0 + 4]).astype(int)
    for row in order:
        assert sorted(row.tolist()) == [0, 1, 2, 3]


def test_fused_sharded_stays_sharded():
    """shard_map path: per-shard pallas grid, output sharded over data."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from sm3x.ops.augment_pallas import ssl_augment_batch_fused

    mesh = Mesh(np.array(jax.devices()), ("data",))
    b = 16
    canvases = np.random.default_rng(0).integers(
        0, 255, (b, 32, 32, 3), dtype=np.uint8)
    hw = np.full((b, 2), 32, np.int32)
    sh = NamedSharding(mesh, P("data"))
    canvases = jax.device_put(canvases, sh)
    hw = jax.device_put(hw, sh)

    out = jax.jit(lambda r, c, v: ssl_augment_batch_fused(
        r, c, v, MEAN, STD, mesh=mesh))(jax.random.key(0), canvases, hw)
    assert out.shape == (b, 224, 224, 3)
    spec = out.sharding.spec
    assert spec and spec[0] == "data", spec
    assert np.all(np.isfinite(np.asarray(out)))


def test_ssl_train_step_with_pallas_augment(tmp_path):
    """Full SSL step with the fused augmentation on the 8-device mesh."""
    import jax
    from sm3x.core.config import (SSLConfig, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from sm3x.core.mesh import shard_batch
    from sm3x.core import prng
    from sm3x.data.synthetic import synthetic_canvas_batch
    from sm3x.train.backbone_train import SSLTrainer

    cfg = SSLConfig(
        data=DataConfig(img_sz=(48, 48)),
        model=ModelConfig(arch="resnet18", arch_version="v32", proj_dim=32,
                          temperature=0.1, use_pallas_augment=True),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-3, amp=False),
        # world_size=2: 4 samples per negative group (see test_ssl_train)
        run=RunConfig(log_path=str(tmp_path), seed=0, world_size=2),
    )
    trainer = SSLTrainer(cfg)
    canvases, hw, _ = synthetic_canvas_batch(8, canvas=64, seed=0)
    db = shard_batch(trainer.mesh, {
        "derm": canvases, "derm_hw": hw, "clinic": canvases, "clinic_hw": hw})
    rng = prng.step_rng(trainer.rng, 0, 0)
    losses = []
    for _ in range(3):
        trainer.state, metrics = trainer.train_step(
            trainer.state, db["derm"], db["derm_hw"],
            db["clinic"], db["clinic_hw"], rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
