"""sm3x -> .pth export (sm3x.utils.torch_export): roundtrip through the
.pth->sm3x loaders, strict-load into the torch oracle (proving the
reference's own `load_state_dict(strict=True)`, inference.py:127, would
accept an sm3x-exported checkpoint), and forward parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from sm3x.models.mlc import MLCModel
from sm3x.models.simclr import SimCLRSkinV32
from sm3x.utils.torch_convert import (convert_mlc_model, convert_simclr_skin,
                                      load_torch_state_dict)
from sm3x.utils.torch_export import (export_mlc_model, export_simclr_skin,
                                     save_torch_checkpoint)

from test_golden_pth_lock import TorchEvalModel


def _tree_allclose(a, b, atol=1e-6):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32), atol=atol)


@pytest.fixture(scope="module")
def mlc_vars():
    model = MLCModel(arch="resnet18", proj_dim=32, sa_dim_ff=16,
                     use_prototype_bias=True, dtype=jnp.float32)
    d = jnp.zeros((1, 56, 56, 3), jnp.float32)
    v = model.init({"params": jax.random.key(3), "dropout": jax.random.key(4)},
                   d, d)
    # non-trivial batch stats so the stat conversion is exercised
    stats = jax.tree.map(
        lambda x: x + 0.1 * jax.random.normal(jax.random.key(5), x.shape) ** 2,
        v["batch_stats"])
    return model, {"params": v["params"], "batch_stats": stats}


def test_mlc_pth_roundtrip(mlc_vars, tmp_path):
    """export -> .pth on disk -> convert back == original trees."""
    _, v = mlc_vars
    sd = export_mlc_model(v["params"], v["batch_stats"], arch="resnet18")
    path = str(tmp_path / "exported.pth")
    save_torch_checkpoint(path, sd, epoch=7)
    obj = torch.load(path, map_location="cpu", weights_only=False)
    assert obj["epoch"] == 7
    rp, rs = convert_mlc_model(load_torch_state_dict(path), arch="resnet18")
    _tree_allclose(rp, v["params"])
    _tree_allclose(rs, v["batch_stats"])


def test_mlc_strict_load_and_forward_parity(mlc_vars):
    """The exported state dict strict-loads into the torch oracle (the
    reference model's exact key/shape surface) after the inference.py
    encoder-strip, and the torch forward matches the sm3x forward."""
    model, v = mlc_vars
    sd = export_mlc_model(v["params"], v["batch_stats"], arch="resnet18")
    tm = TorchEvalModel(feat_dim=1024, proj_dim=32, ff=16)
    # the oracle mirrors the released layout (encoder. inside extractor
    # keys), so the exported dict strict-loads as-is
    tensors = {k: torch.from_numpy(np.ascontiguousarray(x))
               for k, x in sd.items()}
    tm.load_state_dict(tensors, strict=True)
    tm.eval()

    rng = np.random.default_rng(0)
    d = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    c = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        t_preds = tm(torch.from_numpy(d), torch.from_numpy(c))
    _, j_preds = model.apply(v, jnp.asarray(d.transpose(0, 2, 3, 1)),
                             jnp.asarray(c.transpose(0, 2, 3, 1)))
    for tp, jp in zip(t_preds, j_preds):
        np.testing.assert_allclose(tp.numpy(), np.asarray(jp),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("variant,final_bn_idx", [("v1", 7), ("v2", 4),
                                                  ("v3", 1)])
def test_mlc_projector_bn_variants_roundtrip(tmp_path, variant, final_bn_idx):
    """Projector variants with BN stacks (v1/v2/v3) export too: their
    FINAL BatchNorm is affine=False (reference projector.py), so the
    export must emit stat-only keys for it — no weight/bias, which
    torch's strict load would reject (and whose flax params don't
    exist)."""
    model = MLCModel(arch="resnet18", proj_dim=32, mlc_proj=variant,
                     sa_dim_ff=16, use_prototype_bias=True,
                     dtype=jnp.float32)
    d = jnp.zeros((1, 56, 56, 3), jnp.float32)
    v = model.init({"params": jax.random.key(6), "dropout": jax.random.key(7)},
                   d, d)
    sd = export_mlc_model(v["params"], v["batch_stats"], arch="resnet18",
                          variant=variant)
    # the final BN is stat-only; earlier BNs (v1/v2) are affine
    if variant != "v3":
        assert "projectors.projectors.0.1.weight" in sd
    assert f"projectors.projectors.0.{final_bn_idx}.running_mean" in sd
    assert f"projectors.projectors.0.{final_bn_idx}.weight" not in sd
    path = str(tmp_path / f"{variant}.pth")
    save_torch_checkpoint(path, sd)
    rp, rs = convert_mlc_model(load_torch_state_dict(path), arch="resnet18",
                               variant=variant)
    _tree_allclose(rp, v["params"])
    _tree_allclose(rs, v["batch_stats"])


def test_ssl_roundtrip(tmp_path):
    model = SimCLRSkinV32(arch="resnet18", proj_dim=16, dtype=jnp.float32)
    d = jnp.zeros((2, 48, 48, 3), jnp.float32)
    v = model.init(jax.random.key(0), (d, d), (d, d))
    sd = export_simclr_skin(v["params"], v["batch_stats"], arch="resnet18")
    assert "cross_proj.0.0.weight" in sd  # V32: per-modality projectors
    path = str(tmp_path / "ssl.pth")
    save_torch_checkpoint(path, sd, ddp_prefix=True)
    raw = load_torch_state_dict(path)
    assert all(k.startswith("module.") for k in raw)
    rp, rs = convert_simclr_skin(raw, arch="resnet18")
    _tree_allclose(rp, v["params"])
    _tree_allclose(rs, v["batch_stats"])


def test_cli_tool(tmp_path, mlc_vars):
    """tools/export_torch_ckpt.py end-to-end on a trainer-style msgpack."""
    import subprocess
    import sys
    import os

    from sm3x.utils.checkpoint import save_checkpoint

    _, v = mlc_vars
    ck = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(ck, {"epoch": 3, "params": v["params"],
                         "batch_stats": v["batch_stats"]})
    out = str(tmp_path / "best.pth")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/export_torch_ckpt.py"),
         "--ckpt", ck, "--kind", "mlc", "--out", out, "-a", "resnet18"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    rp, _ = convert_mlc_model(load_torch_state_dict(out), arch="resnet18")
    _tree_allclose(rp, v["params"])
