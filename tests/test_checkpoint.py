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
