"""Stage-1 SSL end-to-end slice: jitted train step over an 8-device mesh,
loss decreases on synthetic data (SURVEY §7 minimum end-to-end slice)."""

import dataclasses

import numpy as np
import pytest

import jax

from sm3x.core.config import SSLConfig, DataConfig, ModelConfig, OptimConfig, RunConfig
from sm3x.data.synthetic import synthetic_canvas_batch
from sm3x.train.backbone_train import SSLTrainer
from sm3x.core import prng
from sm3x.core.mesh import make_mesh, shard_batch


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    log = tmp_path_factory.mktemp("ssl_logs")
    return SSLConfig(
        data=DataConfig(img_sz=(48, 48)),
        model=ModelConfig(arch="resnet18", arch_version="v32", proj_dim=32,
                          temperature=0.1),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-3, amp=False),
        # world_size=2 -> 4 samples per negative group. With the default
        # (groups = 8 mesh devices) each group holds ONE sample and NT-Xent
        # degenerates to exactly 0 (positive is the only logit), which made
        # the loss-decreases assert vacuous fp-noise.
        run=RunConfig(log_path=str(log), seed=0, world_size=2),
    )


@pytest.fixture(scope="module")
def trainer(tiny_cfg):
    return SSLTrainer(tiny_cfg)


def test_ssl_train_step_loss_decreases(tiny_cfg, trainer):
    assert len(jax.devices()) == 8  # virtual CPU mesh from conftest
    canvases, hw, _ = synthetic_canvas_batch(8, canvas=64, seed=0)
    db = shard_batch(trainer.mesh, {
        "derm": canvases, "derm_hw": hw, "clinic": canvases, "clinic_hw": hw})

    # FIXED rng -> identical augmented views each step: pure overfitting,
    # so the loss must fall.
    rng = prng.step_rng(trainer.rng, 0, 0)
    losses = []
    for _ in range(5):
        trainer.state, metrics = trainer.train_step(
            trainer.state, db["derm"], db["derm_hw"],
            db["clinic"], db["clinic_hw"], rng)
        losses.append(float(metrics["loss"]))
        for k in ("derm", "clinic", "cross"):
            assert np.isfinite(float(metrics[k]))

    assert losses[-1] < losses[0], losses


def test_ssl_groups_match_world_size(tiny_cfg, trainer):
    # explicit world_size wins; without it groups = mesh data-axis size
    assert trainer.groups == 2
    cfg = dataclasses.replace(
        tiny_cfg, run=dataclasses.replace(tiny_cfg.run, world_size=None))
    t2 = SSLTrainer(cfg)
    assert t2.groups == t2.mesh.devices.shape[0]


def test_ssl_train_step_deterministic(tiny_cfg, trainer):
    """Same state + same rng -> bitwise-identical loss (donation-safe via
    explicit state copies); different step rng -> different loss."""
    import jax.numpy as jnp
    from sm3x.data.synthetic import synthetic_canvas_batch

    canvases, hw, _ = synthetic_canvas_batch(8, canvas=64, seed=1)
    db = shard_batch(trainer.mesh, {
        "derm": canvases, "derm_hw": hw, "clinic": canvases, "clinic_hw": hw})

    # reuse the trainer's ALREADY-COMPILED step (a fresh
    # jit(train_step.__wrapped__) here compiled a second copy of the
    # whole program mid-suite, and its background compile-cache write
    # starved the 8-device rendezvous -> flaky whole-process SIGABRT,
    # NOTES_ROUND2). train_step donates its state argument, so feed it
    # an explicit copy each call.
    def copy_state(s):
        return jax.tree.map(jnp.copy, s)

    s = trainer.state
    rng = prng.step_rng(trainer.rng, 0, 0)
    _, m1 = trainer.train_step(copy_state(s), db["derm"], db["derm_hw"],
                               db["clinic"], db["clinic_hw"], rng)
    _, m2 = trainer.train_step(copy_state(s), db["derm"], db["derm_hw"],
                               db["clinic"], db["clinic_hw"], rng)
    assert float(m1["loss"]) == float(m2["loss"])

    rng2 = prng.step_rng(trainer.rng, 0, 1)
    _, m3 = trainer.train_step(copy_state(s), db["derm"], db["derm_hw"],
                               db["clinic"], db["clinic_hw"], rng2)
    assert float(m3["loss"]) != float(m1["loss"])


# The multi-crop TRAIN-STEP test lives in tests/isolated/test_multicrop.py
# (process-isolated: the heaviest in-process program pays a 10x collective
# rendezvous stall when it shares the XLA:CPU client with prior trainers —
# see tests/conftest.py). The recipe validation below is cheap (errors at
# trainer construction, no big program) and stays in-process.


def test_async_ckpt_snapshot_is_donation_safe(tmp_path):
    """ckp_N saves run on a background thread off DEVICE-side snapshots
    while later epochs donate the live buffers. The async-written ckp_0
    must equal byte-for-byte what a deterministic 1-epoch run of the
    same config holds at its end — a corrupted-by-donation snapshot
    cannot pass this."""
    from sm3x.data.datasets import build_dataset
    from sm3x.data.synthetic import make_fake_derm7pt
    from sm3x.utils.checkpoint import load_checkpoint

    root = str(tmp_path / "data")
    make_fake_derm7pt(root, n_cases=8, img_size=56)
    data = build_dataset("SevenPCBaseDataset", root, "train", cache_size=64)

    def cfg(epochs, log):
        return SSLConfig(
            data=DataConfig(img_sz=(32, 32)),
            model=ModelConfig(arch="resnet18", arch_version="v32",
                              proj_dim=16, temperature=0.1),
            optim=OptimConfig(epochs=epochs, batch_size=8, base_lr=1e-3,
                              amp=False),
            run=RunConfig(log_path=str(tmp_path / log), seed=0, save_freq=1,
                          ckpt_freq=100, world_size=2),
        )

    t3 = SSLTrainer(cfg(3, "a"))
    t3.fit(data)  # writes ckp_0/1/2 asynchronously, donating in between
    t1 = SSLTrainer(cfg(1, "b"))
    t1.fit(data)  # deterministic twin stopped where ckp_0 was taken

    saved = load_checkpoint(str(tmp_path / "a" / "ckp_0.msgpack"))
    expect = jax.device_get(t1.state.params)
    got = saved["params"]
    for path, a in jax.tree_util.tree_flatten_with_path(expect)[0]:
        b = got
        for k in path:
            b = b[k.key]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))
    # and training actually progressed past the snapshot
    final = jax.device_get(t3.state.params)
    assert any(
        not np.array_equal(x, y)
        for x, y in zip(jax.tree.leaves(expect), jax.tree.leaves(final)))


def test_ssl_multicrop_rejects_bad_recipe(tmp_path):
    """nmb_crops must start with the 2 global views; list lengths must
    agree."""
    base = dict(
        model=ModelConfig(arch="resnet18", arch_version="v32", proj_dim=16,
                          temperature=0.1),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-3, amp=False),
        run=RunConfig(log_path=str(tmp_path), seed=0),
    )
    with pytest.raises(ValueError, match="must start with 2"):
        SSLTrainer(SSLConfig(
            data=DataConfig(data_name="SevenPCSwavDataset", img_sz=(32, 32),
                            size_crops=(32, 16), nmb_crops=(3, 3),
                            min_scale_crops=(0.5, 0.14),
                            max_scale_crops=(1.0, 0.5)), **base))
    with pytest.raises(ValueError, match="equal lengths"):
        SSLTrainer(SSLConfig(
            data=DataConfig(data_name="SevenPCSwavDataset", img_sz=(32, 32),
                            size_crops=(32, 16, 8), nmb_crops=(2, 3),
                            min_scale_crops=(0.5, 0.14),
                            max_scale_crops=(1.0, 0.5)), **base))


def test_ssl_bn_stat_freq(tiny_cfg, tmp_path):
    """--bn-stat-freq K: the fast step trains params through an eval-BN
    forward without touching batch statistics; the refresh step advances
    them (the off-recipe stat-pass escape, BENCH.md round 2)."""
    cfg = dataclasses.replace(
        tiny_cfg,
        model=dataclasses.replace(tiny_cfg.model, bn_stat_freq=2),
        run=dataclasses.replace(tiny_cfg.run, log_path=str(tmp_path)))
    t = SSLTrainer(cfg)
    assert t.fast_step is not None and t.bn_stat_freq == 2

    canvases, hw, _ = synthetic_canvas_batch(8, canvas=64, seed=0)
    db = shard_batch(t.mesh, {
        "derm": canvases, "derm_hw": hw, "clinic": canvases, "clinic_hw": hw})
    rng = prng.step_rng(t.rng, 0, 0)

    stats0 = jax.device_get(t.state.batch_stats)
    params0 = jax.device_get(t.state.params)
    state1, m1 = t.fast_step(t.state, db["derm"], db["derm_hw"],
                             db["clinic"], db["clinic_hw"], rng)
    assert np.isfinite(float(m1["loss"]))
    # fast step: batch statistics untouched, params still trained
    for a, b in zip(jax.tree.leaves(stats0),
                    jax.tree.leaves(jax.device_get(state1.batch_stats))):
        np.testing.assert_array_equal(a, b)
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(params0),
                        jax.tree.leaves(jax.device_get(state1.params))))

    # refresh step: statistics advance
    stats1 = jax.device_get(state1.batch_stats)
    state2, m2 = t.train_step(state1, db["derm"], db["derm_hw"],
                              db["clinic"], db["clinic_hw"], rng)
    assert np.isfinite(float(m2["loss"]))
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(stats1),
                        jax.tree.leaves(jax.device_get(state2.batch_stats))))

    # trimodal + bn-stat-freq is refused up front
    with pytest.raises(ValueError, match="dual-modal"):
        SSLTrainer(dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, arch_version="trimodal", bn_stat_freq=2)))


def test_ssl_lr_schedule_optin(tmp_path):
    """--use-lr-schedule: warmup+cosine replaces the constant lr (the
    reference accepts but never consumes the warmup flags); params still
    train and the schedule hits base_lr after warmup."""
    import numpy as np

    from sm3x.core.config import (SSLConfig, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from sm3x.data.datasets import build_dataset
    from sm3x.data.synthetic import make_fake_derm7pt
    from sm3x.train import common
    from sm3x.train.backbone_train import SSLTrainer

    root = str(tmp_path / "data")
    make_fake_derm7pt(root, n_cases=8, img_size=56)
    data = build_dataset("SevenPCBaseDataset", root, "train", cache_size=64)
    cfg = SSLConfig(
        data=DataConfig(img_sz=(32, 32)),
        model=ModelConfig(arch="resnet18", arch_version="v32", proj_dim=16,
                          temperature=0.1),
        optim=OptimConfig(epochs=2, batch_size=8, base_lr=1e-3, final_lr=1e-5,
                          warmup_epochs=1, use_lr_schedule=True, amp=False),
        run=RunConfig(log_path=str(tmp_path), seed=0, save_freq=100,
                      ckpt_freq=100),
    )
    t = SSLTrainer(cfg)
    p0 = jax.device_get(t.state.params)
    t.fit(data)
    p1 = jax.device_get(t.state.params)
    moved = [not np.array_equal(a, b)
             for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))]
    assert any(moved)

    spe = data.steps_per_epoch(8)
    sched = common.warmup_cosine_schedule(1e-3, 1e-5, 1, 2, spe)
    np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(sched(spe)), 1e-3, rtol=1e-6)
    assert float(sched(2 * spe)) < 2e-5

    # resuming mid-run with the schedule flag is refused
    t2 = SSLTrainer(cfg)
    t2.start_epoch = 1
    try:
        t2.fit(data)
        assert False, "expected ValueError"
    except ValueError:
        pass
