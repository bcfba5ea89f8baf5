"""Megatron-style tensor parallelism of ViT SSL backbones.

With --mesh-model > 1 and a vit_* arch the SSL trainer shards every
transformer block's attention heads and MLP hidden dim (and their AdamW
moments) over the mesh "model" axis (sm3x.core.mesh.vit_tp_shardings) —
the BASELINE.json "large-batch contrastive on v5e-16" scaling axis. TP
is pure re-placement of the same program, so the loss must match the
data-parallel run up to reduction-order noise.
"""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from sm3x.core.config import SSLConfig, DataConfig, ModelConfig, OptimConfig, RunConfig
from sm3x.core.mesh import MODEL_AXIS, make_mesh, vit_tp_shardings
from sm3x.data.synthetic import synthetic_canvas_batch


def _cfg(tmp_path, mesh_model, arch="vit_s16"):
    return SSLConfig(
        data=DataConfig(img_sz=(32, 32)),
        model=ModelConfig(arch=arch, arch_version="v32", proj_dim=16,
                          temperature=0.1),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-3, amp=False),
        run=RunConfig(log_path=str(tmp_path / f"m{mesh_model}"), seed=0,
                      mesh_model=mesh_model, world_size=4),
    )


def _eq(arr, mesh, spec):
    return arr.sharding.is_equivalent_to(NamedSharding(mesh, spec), arr.ndim)


def test_vit_tp_spec_shapes():
    """The spec walker targets exactly the block attention/MLP weights."""
    mesh = make_mesh(model=2)
    tree = {
        "enc": {
            "block0": {
                "attn": {
                    "query": {"kernel": np.zeros((64, 4, 16)),
                              "bias": np.zeros((4, 16))},
                    "out": {"kernel": np.zeros((4, 16, 64)),
                            "bias": np.zeros((64,))},
                },
                "fc1": {"kernel": np.zeros((64, 256)),
                        "bias": np.zeros((256,))},
                "fc2": {"kernel": np.zeros((256, 64)),
                        "bias": np.zeros((64,))},
                "ln1": {"scale": np.zeros((64,))},
            },
            # same names OUTSIDE a block stay replicated (projector MLPs
            # also use fc1/fc2)
            "projector": {"fc1": {"kernel": np.zeros((64, 256))}},
            # head count not divisible by model=2 -> replicated fallback
            "block1": {"attn": {"query": {"kernel": np.zeros((64, 3, 16))}}},
        }
    }
    spec = vit_tp_shardings(mesh, tree)
    b0 = spec["enc"]["block0"]
    assert b0["attn"]["query"]["kernel"] == NamedSharding(
        mesh, P(None, MODEL_AXIS, None))
    assert b0["attn"]["query"]["bias"] == NamedSharding(
        mesh, P(MODEL_AXIS, None))
    assert b0["attn"]["out"]["kernel"] == NamedSharding(
        mesh, P(MODEL_AXIS, None, None))
    assert b0["attn"]["out"]["bias"] == NamedSharding(mesh, P())
    assert b0["fc1"]["kernel"] == NamedSharding(mesh, P(None, MODEL_AXIS))
    assert b0["fc1"]["bias"] == NamedSharding(mesh, P(MODEL_AXIS))
    assert b0["fc2"]["kernel"] == NamedSharding(mesh, P(MODEL_AXIS, None))
    assert b0["fc2"]["bias"] == NamedSharding(mesh, P())
    assert b0["ln1"]["scale"] == NamedSharding(mesh, P())
    assert spec["enc"]["projector"]["fc1"]["kernel"] == NamedSharding(mesh, P())
    assert spec["enc"]["block1"]["attn"]["query"]["kernel"] == NamedSharding(
        mesh, P())


def test_ssl_vit_tp_placement_and_dp_parity(tmp_path):
    from sm3x.core import prng
    from sm3x.core.mesh import shard_batch
    from sm3x.train.backbone_train import SSLTrainer

    mesh_tp = make_mesh(model=2)  # 4 data x 2 model over the 8 CPU devices
    t_tp = SSLTrainer(_cfg(tmp_path, 2), mesh=mesh_tp)

    blk = t_tp.state.params["derm_backbone"]["encoder"]["block0"]
    qk = blk["attn"]["query"]["kernel"]
    assert _eq(qk, mesh_tp, P(None, MODEL_AXIS, None)), qk.sharding
    assert _eq(blk["fc1"]["kernel"], mesh_tp, P(None, MODEL_AXIS))
    assert _eq(blk["attn"]["out"]["kernel"], mesh_tp, P(MODEL_AXIS, None, None))
    # patch embed + projector stay replicated
    pe = t_tp.state.params["derm_backbone"]["encoder"]["patch_embed"]["kernel"]
    assert _eq(pe, mesh_tp, P())
    pj = t_tp.state.params["derm_backbone"]["projector"]["fc1"]["kernel"]
    assert _eq(pj, mesh_tp, P())
    # AdamW moments mirror the TP placement
    moment_leaves = [
        l for l in jax.tree.leaves(t_tp.state.opt_state)
        if getattr(l, "shape", None) == qk.shape
    ]
    assert moment_leaves and all(
        _eq(l, mesh_tp, P(None, MODEL_AXIS, None)) for l in moment_leaves)

    # one full train step runs, keeps the TP placement on the updated
    # params (GSPMD propagates shardings through the donated state), and
    # matches a pure-DP mesh with the same 4-wide data axis
    t_dp = SSLTrainer(_cfg(tmp_path, 1),
                      mesh=make_mesh(jax.devices()[:4], model=1))
    canvases, hw, _ = synthetic_canvas_batch(8, canvas=48, seed=0)
    losses = {}
    for name, t in (("tp", t_tp), ("dp", t_dp)):
        db = shard_batch(t.mesh, {"derm": canvases, "derm_hw": hw,
                                  "clinic": canvases, "clinic_hw": hw})
        t.state, m = t.train_step(t.state, db["derm"], db["derm_hw"],
                                  db["clinic"], db["clinic_hw"],
                                  prng.step_rng(t.rng, 0, 0))
        losses[name] = float(m["loss"])
    assert np.isfinite(losses["tp"])
    np.testing.assert_allclose(losses["tp"], losses["dp"],
                               rtol=1e-3, atol=1e-3)
    qk2 = t_tp.state.params["derm_backbone"]["encoder"]["block0"]["attn"][
        "query"]["kernel"]
    assert _eq(qk2, mesh_tp, P(None, MODEL_AXIS, None)), qk2.sharding


def test_ssl_resnet_mesh_model_replicates(tmp_path):
    """--mesh-model with a ResNet arch keeps plain replication (no ResNet
    TP is defined); placement must not crash or mis-shard."""
    from sm3x.train.backbone_train import SSLTrainer

    mesh = make_mesh(model=2)
    cfg = _cfg(tmp_path, 2, arch="resnet18")
    t = SSLTrainer(cfg, mesh=mesh)
    conv = t.state.params["derm_backbone"]["encoder"]["conv1"]["kernel"]
    assert _eq(conv, mesh, P())
