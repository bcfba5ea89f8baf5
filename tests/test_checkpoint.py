"""Checkpoint save/restore + the four .pth key-surgery conventions."""

import os

import numpy as np
import torch

import jax.numpy as jnp

from sm3x.utils.checkpoint import (
    save_checkpoint, load_checkpoint, export_backbone,
)
from sm3x.utils import torch_convert as tc


def test_msgpack_roundtrip(tmp_path):
    tree = {
        "epoch": 3,
        "params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
                   "b": {"c": np.ones(4, np.float32)}},
    }
    path = os.path.join(tmp_path, "ckp.msgpack")
    save_checkpoint(path, tree)
    out = load_checkpoint(path)
    assert out["epoch"] == 3
    np.testing.assert_array_equal(out["params"]["a"], tree["params"]["a"])
    np.testing.assert_array_equal(out["params"]["b"]["c"], tree["params"]["b"]["c"])


def test_save_checkpoint_many_one_fetch_two_files(tmp_path):
    """The boundary dedupe: one serialization written to N paths, each
    atomic, byte-identical, and independently loadable."""
    from sm3x.utils.checkpoint import save_checkpoint_many

    tree = {"epoch": 7, "params": {"w": np.arange(8, dtype=np.float32)}}
    p1 = os.path.join(tmp_path, "ckp_6.msgpack")
    p2 = os.path.join(tmp_path, "checkpoint.msgpack")
    out = save_checkpoint_many([p1, p2], tree)
    assert out == [p1, p2]
    with open(p1, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()
    for p in (p1, p2):
        got = load_checkpoint(p)
        assert got["epoch"] == 7
        np.testing.assert_array_equal(got["params"]["w"], tree["params"]["w"])
        assert not os.path.exists(p + ".tmp")


def test_export_backbone_filters_heads():
    params = {
        "derm_backbone": {"encoder": {"conv1": {"kernel": np.zeros(1)}},
                          "projector": {"fc1": {"kernel": np.zeros(1)}}},
        "clinic_backbone": {"encoder": {"conv1": {"kernel": np.zeros(1)}}},
        "cross_proj_derm": {"fc1": {"kernel": np.zeros(1)}},
    }
    out = export_backbone(params, params)
    assert "cross_proj_derm" not in out["params"]
    assert "projector" not in out["params"]["derm_backbone"]
    assert "encoder" in out["params"]["derm_backbone"]


def test_strip_conventions():
    sd = {
        "module.encoder.conv1.weight": np.zeros(1),
        "module.encoder.fc.weight": np.zeros(1),
        "module.other": np.zeros(1),
    }
    out = tc.strip_module(sd)
    assert "encoder.conv1.weight" in out
    out2 = tc.strip_prefix(out, "encoder.")
    assert set(out2) == {"conv1.weight", "fc.weight"}
    out3 = tc.strip_encoder_substring(
        {"extractor.derm_backbone.encoder.conv1.weight": np.zeros(1)})
    assert "extractor.derm_backbone.conv1.weight" in out3


def test_load_torch_training_state_wrapper(tmp_path):
    """torch.save {epoch, state_dict, optimizer, scaler} wrapper unwraps."""
    sd = {"w": torch.zeros(2, 2)}
    path = os.path.join(tmp_path, "ckp.pth")
    torch.save({"epoch": 5, "state_dict": sd, "optimizer": {}, "scaler": {}}, path)
    out = tc.load_torch_state_dict(path)
    assert set(out) == {"w"}
    assert out["w"].shape == (2, 2)


def test_orbax_manager_roundtrip(tmp_path):
    from sm3x.utils.checkpoint import OrbaxManager

    mgr = OrbaxManager(str(tmp_path / "orbax"), max_to_keep=2)
    tree = {"params": {"w": np.arange(4, dtype=np.float32)}, "epoch": 1}
    mgr.save(1, tree)
    mgr.save(2, {"params": {"w": np.ones(4, np.float32)}, "epoch": 2})
    mgr.wait()
    assert mgr.latest_step() == 2
    out = mgr.restore()
    np.testing.assert_array_equal(out["params"]["w"], np.ones(4, np.float32))
    mgr.close()


def test_ssl_trainer_orbax_backend_resume(tmp_path):
    """SSLTrainer with ckpt_backend=orbax: async epoch saves land in
    orbax_ckpt/, and a fresh trainer resumes params + epoch from them."""
    import dataclasses

    import jax
    from sm3x.core.config import (SSLConfig, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from sm3x.data.datasets import build_dataset
    from sm3x.data.synthetic import make_fake_derm7pt
    from sm3x.train.backbone_train import SSLTrainer

    root = str(tmp_path / "data")
    make_fake_derm7pt(root, n_cases=8, img_size=56)
    cfg = SSLConfig(
        data=DataConfig(img_sz=(48, 48)),
        model=ModelConfig(arch="resnet18", arch_version="v32", proj_dim=16,
                          temperature=0.1),
        optim=OptimConfig(epochs=2, batch_size=8, base_lr=1e-3, amp=False),
        run=RunConfig(log_path=str(tmp_path), seed=0, world_size=2,
                      ckpt_backend="orbax", ckpt_freq=1, save_freq=100),
    )
    data = build_dataset("SevenPCBaseDataset", root, "train", cache_size=64)
    t1 = SSLTrainer(cfg)
    t1.fit(data)
    odir = os.path.join(str(tmp_path), "orbax_ckpt")
    assert os.path.isdir(odir)

    cfg2 = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, log_path=str(tmp_path / "r2")))
    t2 = SSLTrainer(cfg2)
    assert t2.resume_from_orbax(odir)
    assert t2.start_epoch == 2
    w1 = jax.tree.leaves(t1.state.params)[0]
    w2 = jax.tree.leaves(t2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def _fake_data(tmp_path, n_cases=12, img_size=64):
    from sm3x.data.synthetic import make_fake_derm7pt
    from sm3x.data.derm7pt import Derm7ptMeta
    from sm3x.data.pipeline import PairedImageData

    root = str(tmp_path / "data")
    make_fake_derm7pt(root, n_cases=n_cases, img_size=img_size)
    meta = Derm7ptMeta(root)
    return (PairedImageData.from_meta(meta, "train", cache_size=64),
            PairedImageData.from_meta(meta, "test", cache_size=64))


def test_mlc_trainer_orbax_resume_restores_bank(tmp_path):
    """DeepCluster state (params/opt/bank/epoch) round-trips through the
    orbax backend; resume skips init_memory and continues mid-schedule."""
    import dataclasses

    import jax
    from sm3x.core.config import (MLCTrainConfig, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from sm3x.train.mlc_train import MLCTrainer

    train, _ = _fake_data(tmp_path)
    cfg = MLCTrainConfig(
        data=DataConfig(img_sz=(48, 48)),
        model=ModelConfig(arch="resnet18", mlc_proj="v4", mlc_proj_dim=16,
                          num_heads=1, sa_dim_ff=16, temperature=1.0),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-3, amp=False),
        run=RunConfig(log_path=str(tmp_path / "r1"), seed=0,
                      ckpt_backend="orbax", ckpt_freq=1, save_freq=100),
        kmeans_iters=2,
    )
    t1 = MLCTrainer(cfg)
    t1.fit(train)
    odir = os.path.join(cfg.run.log_path, "orbax_ckpt")
    assert os.path.isdir(odir)

    cfg2 = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, log_path=str(tmp_path / "r2")))
    t2 = MLCTrainer(cfg2)
    assert t2.resume(odir)
    assert t2.start_epoch == 1
    np.testing.assert_array_equal(np.asarray(t1.bank), np.asarray(t2.bank))
    w1, w2 = (jax.tree.leaves(t.state.params)[0] for t in (t1, t2))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_eval_trainer_msgpack_rolling_resume(tmp_path):
    """The per-epoch rolling checkpoint.msgpack written by the supervised
    eval trainer resumes epoch + best_val_auc + opt_state via resume()."""
    import jax
    from sm3x.core.config import (EvalConfig, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from sm3x.train.backbone_eval import BackboneEvalTrainer

    train, test = _fake_data(tmp_path)
    cfg = EvalConfig(
        data=DataConfig(img_sz=(48, 48)),
        model=ModelConfig(arch="resnet18", finetune="fc"),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-2, amp=False),
        run=RunConfig(log_path=str(tmp_path / "e1"), seed=0, ckpt_freq=1),
    )
    t1 = BackboneEvalTrainer(cfg)
    best = t1.fit(train, test)
    roll = os.path.join(cfg.run.log_path, "checkpoint.msgpack")
    assert os.path.isfile(roll)

    t2 = BackboneEvalTrainer(cfg)
    assert t2.resume(roll)
    assert t2.start_epoch == 1
    assert t2.best_auc == best
    w1, w2 = (jax.tree.leaves(t.state.params)[0] for t in (t1, t2))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    # opt_state round-trips as the typed optax tree
    o1, o2 = (jax.tree.leaves(t.state.opt_state) for t in (t1, t2))
    assert len(o1) == len(o2)


def test_nan_guard_dumps_state_and_raises(tmp_path):
    """--nan-guard: a non-finite epoch loss dumps the full training state
    and fails fast; finite losses pass through untouched."""
    import dataclasses

    import pytest

    from sm3x.core.config import (SSLConfig, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from sm3x.train.backbone_train import SSLTrainer

    cfg = SSLConfig(
        data=DataConfig(img_sz=(32, 32)),
        model=ModelConfig(arch="resnet18", arch_version="v32", proj_dim=16,
                          temperature=0.1),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-3, amp=False),
        run=RunConfig(log_path=str(tmp_path), seed=0, nan_guard=True),
    )
    t = SSLTrainer(cfg)
    t.guard_loss(0, 1.25)  # finite: no-op
    with pytest.raises(FloatingPointError, match="epoch 3"):
        t.guard_loss(3, float("nan"))
    dump = os.path.join(str(tmp_path), "nan_dump.msgpack")
    assert os.path.isfile(dump)
    out = load_checkpoint(dump)
    assert out["epoch"] == 4 and "params" in out and "opt_state" in out

    # guard off: nan passes through (reference behavior)
    t2 = SSLTrainer(dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, nan_guard=False,
                                     log_path=str(tmp_path / "off"))))
    t2.guard_loss(0, float("nan"))
