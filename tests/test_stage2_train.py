"""Stage-2 DeepCluster + supervised eval trainers on a synthetic dataset."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sm3x.core.config import (
    MLCTrainConfig, EvalConfig, DataConfig, ModelConfig, OptimConfig, RunConfig,
)
from sm3x.data.synthetic import make_fake_derm7pt
from sm3x.data.derm7pt import Derm7ptMeta
from sm3x.data.pipeline import PairedImageData


@pytest.fixture(scope="module")
def fake_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("7pc2")
    make_fake_derm7pt(str(root), n_cases=16, img_size=72)
    meta = Derm7ptMeta(str(root))
    train = PairedImageData.from_meta(meta, "train", cache_size=64)
    test = PairedImageData.from_meta(meta, "test", cache_size=64)
    return train, test


def _model_cfg(**kw):
    base = dict(arch="resnet18", mlc_proj="v4", mlc_proj_dim=32,
                num_heads=1, sa_dim_ff=16, sa_dropout=0.1)
    base.update(kw)
    return ModelConfig(**base)


def test_mlc_deepcluster_epoch(fake_data, tmp_path):
    from sm3x.train.mlc_train import MLCTrainer

    train, _ = fake_data
    cfg = MLCTrainConfig(
        data=DataConfig(img_sz=(48, 48)),
        model=_model_cfg(temperature=1.0),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-3, amp=False),
        run=RunConfig(log_path=str(tmp_path), seed=0, save_freq=100),
        kmeans_iters=3,
    )
    trainer = MLCTrainer(cfg)
    trainer.init_memory(train)
    assert trainer.bank.shape == (8, train.n, 32)
    assert np.isfinite(np.asarray(trainer.bank)).all()

    stat = trainer.train_epoch(train, epoch=0)
    assert np.isfinite(stat["loss"])
    # prototype kernels were overwritten by unit-norm centroids
    protos = jax.device_get(trainer.state.params)["head"]["prototypes"]
    for i, k in enumerate([5, 3, 2, 3, 3, 3, 3, 2]):
        kern = protos[f"proto{i}"]["kernel"]  # (D, K)
        assert kern.shape == (32, k)
        # centroids are unit-norm at the epoch boundary; the epoch's
        # gradient steps then nudge them (same drift as the reference)
        np.testing.assert_allclose(np.linalg.norm(kern, axis=0), 1.0, atol=0.05)
    # frozen extractor must not move
    ext0 = jax.device_get(trainer.state.params)["extractor"]
    stat = trainer.train_epoch(train, epoch=1)
    ext1 = jax.device_get(trainer.state.params)["extractor"]
    leaves0 = jax.tree.leaves(ext0)
    leaves1 = jax.tree.leaves(ext1)
    assert all(np.array_equal(a, b) for a, b in zip(leaves0, leaves1))


def test_mlc_eval_freeze_fc(fake_data, tmp_path):
    from sm3x.train.mlc_eval import MLCEvalTrainer
    from sm3x.train.supervised import run_train_epoch, run_eval_epoch

    train, test = fake_data
    cfg = EvalConfig(
        data=DataConfig(img_sz=(48, 48)),
        model=_model_cfg(finetune="fc"),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-2, amp=False),
        run=RunConfig(log_path=str(tmp_path), seed=0),
        train_sz=48, test_sz=48,
    )
    trainer = MLCEvalTrainer(cfg)
    p0 = jax.device_get(trainer.state.params)
    tr = run_train_epoch(trainer, train, 0)
    va = run_eval_epoch(trainer, test, 0)
    p1 = jax.device_get(trainer.state.params)
    assert "AUC_AVG" in va and np.isfinite(tr["loss"])
    # extractor + projectors + sa frozen; prototypes moved
    for key in ("extractor",):
        a = jax.tree.leaves(p0[key])
        b = jax.tree.leaves(p1[key])
        assert all(np.array_equal(x, y) for x, y in zip(a, b))
    a = jax.tree.leaves(p0["head"]["projectors"])
    b = jax.tree.leaves(p1["head"]["projectors"])
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    a = jax.tree.leaves(p0["head"]["prototypes"])
    b = jax.tree.leaves(p1["head"]["prototypes"])
    assert any(not np.array_equal(x, y) for x, y in zip(a, b))


def test_backbone_eval_freeze_fc(fake_data, tmp_path):
    from sm3x.train.backbone_eval import BackboneEvalTrainer
    from sm3x.train.supervised import run_train_epoch

    train, _ = fake_data
    cfg = EvalConfig(
        data=DataConfig(img_sz=(48, 48)),
        model=_model_cfg(finetune="fc"),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-2, amp=False),
        run=RunConfig(log_path=str(tmp_path), seed=0),
    )
    trainer = BackboneEvalTrainer(cfg)
    p0 = jax.device_get(trainer.state.params)
    run_train_epoch(trainer, train, 0)
    p1 = jax.device_get(trainer.state.params)
    a = jax.tree.leaves(p0["derm_backbone"])
    b = jax.tree.leaves(p1["derm_backbone"])
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    a = jax.tree.leaves(p0["classifier"])
    b = jax.tree.leaves(p1["classifier"])
    assert any(not np.array_equal(x, y) for x, y in zip(a, b))


def test_mlc_eval_finetune_all_stem_frozen(fake_data, tmp_path):
    """finetune='all': residual stages train, stem stays frozen
    (mlc_eval.py:379-388)."""
    from sm3x.train.mlc_eval import MLCEvalTrainer
    from sm3x.train.supervised import run_train_epoch

    train, _ = fake_data
    cfg = EvalConfig(
        data=DataConfig(img_sz=(48, 48)),
        model=_model_cfg(finetune="all"),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-2, amp=False),
        run=RunConfig(log_path=str(tmp_path), seed=0),
        train_sz=48, test_sz=48,
    )
    trainer = MLCEvalTrainer(cfg)
    p0 = jax.device_get(trainer.state.params)
    run_train_epoch(trainer, train, 0)
    p1 = jax.device_get(trainer.state.params)

    enc0 = p0["extractor"]["derm_backbone"]["encoder"]
    enc1 = p1["extractor"]["derm_backbone"]["encoder"]
    # stem frozen
    assert np.array_equal(enc0["conv1"]["kernel"], enc1["conv1"]["kernel"])
    assert np.array_equal(enc0["bn1"]["scale"], enc1["bn1"]["scale"])
    # residual stages moved
    moved = [
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(enc0["layer4_1"]),
                        jax.tree.leaves(enc1["layer4_1"]))
    ]
    assert any(moved)


def test_mlc_trainer_with_pallas_augment(fake_data, tmp_path):
    """MLC embed + train steps run with the fused Pallas augmentation
    (interpret mode on the CPU mesh), losses finite."""
    from sm3x.train.mlc_train import MLCTrainer

    train, _ = fake_data
    cfg = MLCTrainConfig(
        data=DataConfig(img_sz=(48, 48)),
        model=_model_cfg(temperature=1.0, use_pallas_augment=True),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-3, amp=False),
        run=RunConfig(log_path=str(tmp_path), seed=0, save_freq=100),
        kmeans_iters=2,
    )
    trainer = MLCTrainer(cfg)
    trainer.init_memory(train)
    assert np.isfinite(np.asarray(trainer.bank)).all()
    stat = trainer.train_epoch(train, epoch=0)
    assert np.isfinite(stat["loss"])


def test_cluster_and_update_touches_only_prototypes():
    """The epoch-boundary clustering must not round-trip the backbone
    tree: untouched subtrees pass through by reference, only the
    prototype kernels are replaced (regression: a full device_get/
    shard_label_heads cycle moved ~200 MB per epoch)."""
    from sm3x.train.mlc_train import cluster_and_update

    rng = jax.random.key(0)
    num_classes = (3, 2)
    dim, n = 8, 16
    bank = jax.random.normal(jax.random.key(1), (2, n, dim))
    bank = bank / jnp.linalg.norm(bank, axis=-1, keepdims=True)
    extractor = {"conv": {"kernel": jnp.ones((3, 3))}}
    params = {
        "extractor": extractor,
        "head": {
            "prototypes": {
                "proto0": {"kernel": jnp.zeros((dim, 3))},
                "proto1": {"kernel": jnp.zeros((dim, 2))},
            },
            "sa": {"w": jnp.ones((4,))},
        },
    }
    out, assignments = cluster_and_update(rng, bank, params,
                                          num_classes, iters=2)
    # untouched subtrees are the SAME objects — nothing was copied
    assert out["extractor"] is extractor
    assert out["head"]["sa"] is params["head"]["sa"]
    # prototype kernels carry the centroids (unit-norm columns)
    for i, k in enumerate(num_classes):
        kern = out["head"]["prototypes"][f"proto{i}"]["kernel"]
        assert kern.shape == (dim, k)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(kern), axis=0), 1.0, rtol=1e-5)
    assert assignments.shape == (2, n)
    assert int(assignments.min()) >= 0


def test_graft_rejects_shape_mismatch():
    """_graft must fail with the key path on wrong-shaped checkpoint
    leaves (e.g. a 512-dim stage-2 ckpt into a --mlc-proj-dim 256
    model), not let them explode later inside apply."""
    from sm3x.train.mlc_eval import _graft

    dst = {"head": {"proj": {"kernel": jnp.zeros((256, 8))}}}
    src = {"head": {"proj": {"kernel": jnp.zeros((512, 8))}}}
    with pytest.raises(ValueError, match="head/proj/kernel"):
        _graft(dst, src)
    # matching shapes still graft
    ok = _graft(dst, {"head": {"proj": {"kernel": jnp.ones((256, 8))}}})
    np.testing.assert_allclose(
        np.asarray(ok["head"]["proj"]["kernel"]), 1.0)
