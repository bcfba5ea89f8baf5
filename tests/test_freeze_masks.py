"""Freeze-policy path predicates (mlc_eval.py:374-388 semantics)."""

from sm3x.train.common import (
    mlc_eval_trainable, mlc_train_trainable, backbone_eval_trainable,
)


def test_mlc_eval_fc():
    f = lambda p: mlc_eval_trainable(p, "fc")
    assert f("head/prototypes/proto0/kernel")
    assert not f("head/projectors/heads/fc1/kernel")
    assert not f("head/mlc_sa/linear1/kernel")
    assert not f("extractor/derm_backbone/encoder/conv1/kernel")


def test_mlc_eval_projector():
    f = lambda p: mlc_eval_trainable(p, "projector")
    assert f("head/prototypes/proto0/kernel")
    assert f("head/projectors/heads/fc1/kernel")
    assert f("head/mlc_sa/linear1/kernel")
    assert not f("extractor/derm_backbone/encoder/layer1_0/cb1/conv/kernel")


def test_mlc_eval_all_keeps_stem_frozen():
    f = lambda p: mlc_eval_trainable(p, "all")
    # reference: set_requires_grad(extractor, False) then unfreeze layer1-4
    # (mlc_eval.py:379-388) — conv1/bn1 stay frozen
    assert f("extractor/derm_backbone/encoder/layer1_0/cb1/conv/kernel")
    assert f("extractor/clinic_backbone/encoder/layer4_2/cb3/conv/kernel")
    assert not f("extractor/derm_backbone/encoder/conv1/kernel")
    assert not f("extractor/derm_backbone/encoder/bn1/scale")
    assert f("head/projectors/heads/fc1/kernel")


def test_mlc_train_backbone_freeze():
    f = lambda p: mlc_train_trainable(p, finetune_backbone=False)
    assert not f("extractor/derm_backbone/encoder/conv1/kernel")
    assert f("head/prototypes/proto0/kernel")
    g = lambda p: mlc_train_trainable(p, finetune_backbone=True)
    assert g("extractor/derm_backbone/encoder/conv1/kernel")


def test_backbone_eval_fc():
    f = lambda p: backbone_eval_trainable(p, "fc")
    assert f("classifier/head0/kernel")
    assert not f("derm_backbone/conv1/kernel")
    g = lambda p: backbone_eval_trainable(p, "all")
    assert g("derm_backbone/conv1/kernel")
