"""Tensor parallelism of the stacked per-label projector heads.

With --mesh-model > 1 the MLC trainers shard the nn.vmap-lifted
MultiLabelProjector weights (num_labels, in, out) — and their AdamW
moments — over the mesh "model" axis (PARITY §2c). The loss must match
the pure data-parallel run: TP only re-places the same einsum."""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from sm3x.core.config import (
    MLCTrainConfig, EvalConfig, DataConfig, ModelConfig, OptimConfig, RunConfig,
)
from sm3x.core.mesh import MODEL_AXIS, make_mesh
from sm3x.data.derm7pt import Derm7ptMeta
from sm3x.data.pipeline import PairedImageData
from sm3x.data.synthetic import make_fake_derm7pt


@pytest.fixture(scope="module")
def fake_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("7pctp")
    make_fake_derm7pt(str(root), n_cases=16, img_size=72)
    meta = Derm7ptMeta(str(root))
    return PairedImageData.from_meta(meta, "train", cache_size=64)


def _model_cfg(**kw):
    base = dict(arch="resnet18", mlc_proj="v4", mlc_proj_dim=32,
                num_heads=1, sa_dim_ff=16, sa_dropout=0.1, temperature=1.0)
    base.update(kw)
    return ModelConfig(**base)


def _mlc_cfg(tmp_path, mesh_model):
    return MLCTrainConfig(
        data=DataConfig(img_sz=(48, 48)),
        model=_model_cfg(),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-3, amp=False),
        run=RunConfig(log_path=str(tmp_path / f"m{mesh_model}"), seed=0,
                      save_freq=100, mesh_model=mesh_model, world_size=4),
        kmeans_iters=2,
    )


def _is_model_sharded(arr, mesh):
    return arr.sharding.is_equivalent_to(
        NamedSharding(mesh, P(MODEL_AXIS)), arr.ndim)


def test_mlc_trainer_tp_placement_and_dp_parity(fake_data, tmp_path):
    from sm3x.train.mlc_train import MLCTrainer

    mesh_tp = make_mesh(model=2)  # 4 data x 2 model over the 8 CPU devices
    t_tp = MLCTrainer(_mlc_cfg(tmp_path, 2), mesh=mesh_tp)

    # stacked projector weights and their AdamW moments shard over "model"
    kern = t_tp.state.params["head"]["projectors"]["heads"]["fc1"]["kernel"]
    assert kern.shape[0] == 8
    assert _is_model_sharded(kern, mesh_tp)
    moment_leaves = [
        l for l in jax.tree.leaves(t_tp.state.opt_state)
        if getattr(l, "shape", None) == kern.shape
    ]
    assert moment_leaves and all(
        _is_model_sharded(l, mesh_tp) for l in moment_leaves)
    # the extractor stays replicated
    conv = t_tp.state.params["extractor"]["derm_backbone"]["encoder"]["conv1"]["kernel"]
    assert conv.sharding.is_equivalent_to(
        NamedSharding(mesh_tp, P()), conv.ndim)

    # ONE train step with identical params/batch/assignments must match the
    # DP-only mesh (TP is pure re-placement of the same program; the full
    # DeepCluster epoch is NOT bitwise comparable across meshes because
    # reduction-order fp noise can flip near-boundary k-means assignments)
    # same 4-wide data axis, no model axis: isolates the TP placement
    t_dp = MLCTrainer(_mlc_cfg(tmp_path, 1),
                      mesh=make_mesh(jax.devices()[:4], model=1))

    from sm3x.core import prng
    from sm3x.core.mesh import replicate, shard_batch

    batch = next(iter(fake_data.batches(8, epoch=0, seed=0)))
    n = fake_data.n
    rng_np = np.random.default_rng(0)
    assignments_np = rng_np.integers(0, 2, size=(8, n)).astype(np.int32)
    bank_np = np.zeros((8, n, 32), np.float32)
    losses = {}
    for name, t in (("tp", t_tp), ("dp", t_dp)):
        db = shard_batch(t.mesh, {
            "derm": batch.derm, "derm_hw": batch.derm_hw,
            "clinic": batch.clinic, "clinic_hw": batch.clinic_hw})
        idx = replicate(t.mesh, np.asarray(batch.index))
        assigns = replicate(t.mesh, assignments_np)
        bank = replicate(t.mesh, bank_np)
        _, _, loss = t.train_step(
            t.state, bank, db["derm"], db["derm_hw"],
            db["clinic"], db["clinic_hw"], idx, assigns,
            prng.step_rng(t.rng, 0, 0))
        losses[name] = float(loss)
    assert np.isfinite(losses["tp"])
    # reduction-order fp noise only; a semantic TP bug (dropped/duplicated
    # head contributions) would shift the loss by O(1)
    np.testing.assert_allclose(losses["tp"], losses["dp"],
                               rtol=1e-3, atol=1e-3)


def test_mlc_eval_trainer_tp_placement(tmp_path):
    from sm3x.train.mlc_eval import MLCEvalTrainer

    mesh_tp = make_mesh(model=2)
    cfg = EvalConfig(
        data=DataConfig(img_sz=(48, 48)),
        model=_model_cfg(finetune="projector"),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-3, amp=False),
        run=RunConfig(log_path=str(tmp_path), seed=0, mesh_model=2),
        train_sz=48, test_sz=48,
    )
    trainer = MLCEvalTrainer(cfg, mesh=mesh_tp)
    kern = trainer.state.params["head"]["projectors"]["heads"]["fc1"]["kernel"]
    assert _is_model_sharded(kern, mesh_tp)
