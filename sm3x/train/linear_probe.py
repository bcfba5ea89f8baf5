"""In-tool linear probing of a frozen SSL extractor (reference
tools/backbone_train.py:142-426: 50 epochs of AdamW(ft_lr, eps=1e-5) on a
LogisticRegressMultiHeadEvaluator over the concatenated 4096-d features).

TPU design: the extractor is frozen, so features for the (tiny) dataset
are computed ONCE per epoch-transform draw and the probe trains on cached
features — the reference re-runs the full ResNet every epoch. For the
RRC+flip train transform the features change per epoch, so we recompute
per epoch but only the forward (no backward through the extractor)."""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sm3x import NUM_CLASSES
from sm3x.core import prng
from sm3x.core.mesh import make_mesh, replicate, shard_batch
from sm3x.losses import weighted_multilabel_ce
from sm3x.parallel import host_gather_tree as _host_gather_tree
from sm3x.metrics import compute_stage_metrics
from sm3x.models.baseline import MultiHeadClassifier
from sm3x.ops.augment import PROBE_AUG, eval_resize_batch, ssl_augment_batch
from sm3x.train import common
from sm3x.utils import setup_logger


class LinearProbe:
    """Probe an extract_fn (frozen) with 8 linear heads."""

    def __init__(self, feat_dim: int, ft_lr: float = 1e-3, wd: float = 5e-2,
                 num_classes=tuple(NUM_CLASSES), seed: int = 3407, mesh=None,
                 classes_name=None, cls_weights=None):
        """classes_name/cls_weights default to the Derm7pt 8-label schema;
        transfer datasets (ISIC binary columns) pass their own."""
        from sm3x import CLASSES_NAME, CLS_WEIGHTS

        self.mesh = mesh or make_mesh()
        self.num_classes = tuple(num_classes)
        self.classes_name = tuple(classes_name if classes_name is not None
                                  else CLASSES_NAME)
        self.cls_weights = tuple(cls_weights if cls_weights is not None
                                 else CLS_WEIGHTS)
        assert len(self.classes_name) == len(self.num_classes)
        self.model = MultiHeadClassifier(tuple(num_classes))
        self.rng = prng.root_key(seed)
        params = self.model.init(jax.random.fold_in(self.rng, 3),
                                 jnp.zeros((1, feat_dim), jnp.float32))["params"]
        # AdamW(ft_lr, wd, eps=1e-5) — backbone_train.py:346-348
        tx = common.make_adamw(ft_lr, wd, eps=1e-5)
        self.state = common.TrainState.create(
            apply_fn=self.model.apply, params=replicate(self.mesh, params),
            batch_stats={}, tx=tx)

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, feats, labels, label_weights):
            def loss_fn(p):
                preds = self.model.apply({"params": p}, feats)
                return weighted_multilabel_ce(preds, labels, label_weights)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads=grads), loss

        @jax.jit
        def eval_step(params, feats):
            return self.model.apply({"params": params}, feats)

        self.train_step = train_step
        self.eval_step = eval_step

    def run(self, extract_feats, train_data, val_data, batch_size: int,
            epochs: int = 50, label_weights=(1.0,) * 8, seed: int = 3407,
            logger=None, train_aug=PROBE_AUG):
        """extract_feats(batch, rng, train: bool) -> (B, feat_dim) frozen
        features. Returns the best val stats dict."""
        logger = logger or setup_logger(None, "sm3x.probe")
        best = None
        for epoch in range(epochs):
            # train epoch
            losses = []
            for it, batch in enumerate(train_data.batches(batch_size, epoch, seed)):
                rng = prng.step_rng(self.rng, epoch, it)
                feats = extract_feats(batch, rng, True)
                labels = replicate(self.mesh, jnp.asarray(batch.label, jnp.int32))
                self.state, loss = self.train_step(
                    self.state, feats, labels, tuple(label_weights))
                losses.append(float(loss))
            # eval epoch
            preds_all, targets_all, masks = [], [], []
            for batch in val_data.batches(batch_size, 0, seed, shuffle=False):
                feats = extract_feats(batch, jax.random.key(0), False)
                preds = self.eval_step(self.state.params, feats)
                preds_all.append(list(preds))  # device arrays
                targets_all.append(batch.label)
                masks.append(batch.mask)
            preds_all = _host_gather_tree(preds_all)  # one batched fetch
            from sm3x.train.supervised import _concat_masked

            preds, targets = _concat_masked(preds_all, targets_all, masks)
            stats = compute_stage_metrics(preds, targets,
                                          num_classes=self.num_classes,
                                          cls_weights=self.cls_weights,
                                          classes_name=self.classes_name,
                                          probabilities=False)
            stats["loss"] = float(np.mean(losses))
            if best is None or stats["AUC_AVG"] > best["AUC_AVG"]:
                best = stats
            logger.info(f"probe epoch {epoch}: loss {stats['loss']:.4f} "
                        f"val AUC_AVG {stats['AUC_AVG']:.4f}")
        return best


def make_ssl_extract_fn(ssl_model, state, mesh, mean, std, img_sz=(224, 224),
                        train_aug=PROBE_AUG):
    """Frozen-extractor feature fn over an SSL trainer's model/state."""
    aug = dataclasses.replace(train_aug, out_size=tuple(img_sz))

    @jax.jit
    def feats_train(params, batch_stats, derm, derm_hw, clinic, clinic_hw, rng):
        kd, kc = jax.random.split(rng)
        d = ssl_augment_batch(kd, derm, derm_hw, mean, std, aug)
        c = ssl_augment_batch(kc, clinic, clinic_hw, mean, std, aug)
        df, cf = ssl_model.apply(
            {"params": params, "batch_stats": batch_stats}, d, c,
            train=False, method=ssl_model.extract)
        return jnp.concatenate([df, cf], axis=1)

    @jax.jit
    def feats_eval(params, batch_stats, derm, derm_hw, clinic, clinic_hw):
        d = eval_resize_batch(derm, derm_hw, mean, std, tuple(img_sz))
        c = eval_resize_batch(clinic, clinic_hw, mean, std, tuple(img_sz))
        df, cf = ssl_model.apply(
            {"params": params, "batch_stats": batch_stats}, d, c,
            train=False, method=ssl_model.extract)
        return jnp.concatenate([df, cf], axis=1)

    def extract(batch, rng, train: bool):
        db = shard_batch(mesh, {
            "derm": batch.derm, "derm_hw": batch.derm_hw,
            "clinic": batch.clinic, "clinic_hw": batch.clinic_hw})
        if train:
            return feats_train(state.params, state.batch_stats,
                               db["derm"], db["derm_hw"],
                               db["clinic"], db["clinic_hw"], rng)
        return feats_eval(state.params, state.batch_stats,
                          db["derm"], db["derm_hw"],
                          db["clinic"], db["clinic_hw"])

    return extract
