"""SevenPCBaseDataset2 joint per-pair augmentation semantics.

The reference applies ONE transform call to the stacked derm+clinic
tensor (datasets.py:573-605 — both images first truncated to the common
min(h), min(w)), so the pair shares every random parameter: crop box,
flip, jitter factors, blur sigma. sm3x realizes that in the train step
via sm3x.ops.augment.modality_keys / modality_valid_hw, selected by
--data-name SevenPCBaseDataset2 (VERDICT r3 #3)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sm3x.ops.augment import (AugConfig, modality_keys, modality_valid_hw,
                              ssl_augment_batch)


def test_modality_keys_select():
    kd, kc = jax.random.split(jax.random.PRNGKey(0))
    jd, jc = modality_keys(kd, kc, joint_aug=True)
    assert np.array_equal(np.asarray(jd), np.asarray(jc))
    assert np.array_equal(np.asarray(jd), np.asarray(kd))
    id_, ic = modality_keys(kd, kc, joint_aug=False)
    assert not np.array_equal(np.asarray(id_), np.asarray(ic))


def test_modality_valid_hw_common_region():
    dh = jnp.array([[100, 80], [60, 90]], jnp.int32)
    ch = jnp.array([[90, 85], [70, 50]], jnp.int32)
    a, b = modality_valid_hw(dh, ch, joint_aug=True)
    # reference datasets.py:586-591: both truncated to (min h, min w)
    np.testing.assert_array_equal(np.asarray(a), [[90, 80], [60, 50]])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    a2, b2 = modality_valid_hw(dh, ch, joint_aug=False)
    assert a2 is dh and b2 is ch


def test_joint_key_gives_identical_crop_and_flip():
    """Same key + same valid region -> bitwise-identical crop box and flip
    for DIFFERENT image content, while params still differ across cases.

    Geometry-only config (no jitter/gray/blur), identity normalization;
    clinic = 255 - derm. Crop+resize is affine in intensity (resample rows
    sum to 1) and the flip is a pure reindex, so identical params imply
    aug(clinic) == 1 - aug(derm) pixelwise."""
    cfg = AugConfig(out_size=(32, 32), jitter_p=0.0, grayscale_p=0.0,
                    blur_p=0.0, flip_p=0.5)
    rng = np.random.default_rng(0)
    # all batch rows share the same content so cross-row output
    # differences below can only come from per-case random params
    one = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    derm = np.broadcast_to(one, (4, 64, 64, 3)).copy()
    clinic = 255 - derm
    hw = np.full((4, 2), 64, np.int32)
    mean, std = (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)

    k = jax.random.PRNGKey(7)
    d = np.asarray(ssl_augment_batch(k, derm, hw, mean, std, cfg))
    c = np.asarray(ssl_augment_batch(k, clinic, hw, mean, std, cfg))

    # identical per-case params across modalities (crop box + flip)
    np.testing.assert_allclose(c, 1.0 - d, atol=2e-3)
    # ... while cases still draw DIFFERENT params from the same key
    assert not np.allclose(d[0], d[1], atol=1e-3)
    assert not np.allclose(d[1], d[2], atol=1e-3)


def test_train_step_joint_aug_wiring(tmp_path):
    """End-to-end through the jitted SSL train step: with symmetrized
    branches (clinic params := derm params) and identical derm/clinic
    inputs, --data-name SevenPCBaseDataset2 makes the two modalities see
    literally the same data -> the per-modality NT-Xent parts coincide;
    the default independent-aug dataset keeps them apart."""
    from sm3x.core import prng
    from sm3x.core.config import (SSLConfig, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from sm3x.core.mesh import shard_batch
    from sm3x.data.synthetic import synthetic_canvas_batch
    from sm3x.train.backbone_train import SSLTrainer

    def run(data_name):
        cfg = SSLConfig(
            data=DataConfig(data_name=data_name, img_sz=(48, 48)),
            model=ModelConfig(arch="resnet18", arch_version="v32",
                              proj_dim=16, temperature=0.1),
            optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-3,
                              amp=False),
            run=RunConfig(log_path=str(tmp_path / data_name), seed=0,
                          world_size=2),
        )
        t = SSLTrainer(cfg)
        # symmetrize: clinic branch gets the derm branch's weights/stats,
        # so equal inputs must produce equal per-modality losses
        params = t.state.params
        stats = t.state.batch_stats
        params = dict(params)
        stats = dict(stats)
        params["clinic_backbone"] = jax.tree.map(
            jnp.copy, params["derm_backbone"])
        stats["clinic_backbone"] = jax.tree.map(
            jnp.copy, stats["derm_backbone"])
        t.state = t.state.replace(params=params, batch_stats=stats)

        canvases, hw, _ = synthetic_canvas_batch(8, canvas=64, seed=3)
        db = shard_batch(t.mesh, {
            "derm": canvases, "derm_hw": hw,
            "clinic": canvases, "clinic_hw": hw})
        rng = prng.step_rng(t.rng, 0, 0)
        _, m = t.train_step(t.state, db["derm"], db["derm_hw"],
                            db["clinic"], db["clinic_hw"], rng)
        return float(m["derm"]), float(m["clinic"])

    d2, c2 = run("SevenPCBaseDataset2")
    np.testing.assert_allclose(d2, c2, rtol=1e-5)
    d1, c1 = run("SevenPCBaseDataset")
    assert abs(d1 - c1) > 1e-4, (d1, c1)
