"""Backbone linear eval (reference tools/backbone_eval.py): load the
stage-1 encoders into a Baseline (dual backbone + 8 linear heads), train
the heads (--finetune fc freezes backbones, :302-304), report per-label
metrics. Also hosts the in-tool linear probe of backbone_train.py:293-426
(frozen extractor + LogisticRegressMultiHeadEvaluator, AdamW eps 1e-5)."""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp

from sm3x.core import prng
from sm3x.core.cache import enable_compilation_cache
from sm3x.core.mesh import make_mesh
from sm3x.core.precision import policy_for
from sm3x.models.baseline import Baseline
from sm3x.ops.augment import PROBE_AUG
from sm3x.train import common
from sm3x.train.supervised import (
    make_supervised_steps, run_train_epoch, run_eval_epoch, collect_eval_logits,
)
from sm3x.utils.logging import StatWriter
from sm3x.utils import setup_logger
from sm3x.metrics import write_results_csv
from sm3x.data.prefetch import resident_nbytes, wrap_from_config




class BackboneEvalTrainer(common.CheckpointableTrainer):
    def __init__(self, cfg, mesh=None, logger=None, encoder_tree=None):
        enable_compilation_cache()
        self.cfg = cfg
        self.mesh = mesh or make_mesh(model=cfg.run.mesh_model)
        self.logger = logger or setup_logger(cfg.run.log_path, "sm3x.backbone_eval")
        self.writer = StatWriter(cfg.run.log_path, cfg.run.tensorboard,
                                 cfg.run.wandb, cfg.run.proj_name)
        m = cfg.model
        self.policy = policy_for(cfg.optim.amp)
        self.model = Baseline(
            arch=m.arch, num_classes=tuple(m.num_classes),
            dtype=self.policy.compute_dtype,
        )
        self.rng = prng.root_key(cfg.run.seed)
        dummy = jnp.zeros((2, cfg.data.img_sz[0], cfg.data.img_sz[1], 3), jnp.float32)
        variables = jax.jit(lambda r: self.model.init(
            r, dummy, dummy, train=False))(jax.random.fold_in(self.rng, 0))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        if encoder_tree is not None:
            # SSL state-dict split into per-encoder dicts
            # (backbone_eval.py:278-296): graft the two encoders.
            ep, es = encoder_tree
            for mod in ("derm_backbone", "clinic_backbone"):
                params[mod] = ep[mod]["encoder"]
                batch_stats[mod] = es[mod]["encoder"]

        mask = common.path_mask(
            params, lambda p: common.backbone_eval_trainable(p, m.finetune))
        tx = common.make_adamw(cfg.optim.base_lr, cfg.optim.wd,
                               eps=cfg.optim.adam_eps, mask_tree=mask)
        self.state = common.create_train_state(
            self.model, {"params": params, "batch_stats": batch_stats}, tx)
        self._place_state()

        backbone_train_mode = m.finetune != "fc"
        model = self.model

        def apply_train(params, batch_stats, d, c, kdrop):
            preds, mut = model.apply(
                {"params": params, "batch_stats": batch_stats}, d, c,
                train=backbone_train_mode,
                # fc-policy: cut the feature gradient so XLA prunes the
                # two frozen ResNet backward passes (mlc_eval does the
                # same via stop_extractor_grad)
                stop_backbone_grad=(m.finetune == "fc"),
                mutable=["batch_stats"])
            return preds, mut["batch_stats"]

        def apply_eval(params, batch_stats, d, c):
            return model.apply(
                {"params": params, "batch_stats": batch_stats}, d, c, train=False)

        aug = dataclasses.replace(PROBE_AUG, out_size=tuple(cfg.data.img_sz))
        from sm3x.ops.augment import get_ssl_augment_fn

        self.train_step, self.eval_step = make_supervised_steps(
            apply_train, apply_eval, cfg.optim.label_weights,
            tuple(cfg.data.mean), tuple(cfg.data.std), aug,
            tuple(cfg.data.img_sz),
            aug_fn=get_ssl_augment_fn(m.use_pallas_augment, self.mesh),
            joint_aug=cfg.data.data_name == "SevenPCBaseDataset2")

        self.best_auc = 0.0

    def _state_tree(self, epoch: int):
        tree = super()._state_tree(epoch)
        tree["best_val_auc"] = self.best_auc
        return tree

    def _restore_state_tree(self, tree):
        super()._restore_state_tree(tree)
        self.best_auc = float(tree.get("best_val_auc", 0.0))

    def fit(self, train_data, val_data):
        cfg = self.cfg
        self.warn_unconsumed_lr_schedule()
        train_data = wrap_from_config(train_data, self.mesh, cfg.data)
        # one HBM budget covers BOTH splits: charge what train pinned
        val_data = wrap_from_config(val_data, self.mesh, cfg.data,
                                    reserved_bytes=resident_nbytes(train_data))
        self.install_preemption_handler()
        best_auc = self.best_auc
        for epoch in range(self.start_epoch, cfg.optim.epochs):
            t0 = time.time()
            tr = run_train_epoch(self, train_data, epoch)
            self.guard_loss(epoch, tr["loss"])
            va = run_eval_epoch(self, val_data, epoch)
            self.writer.log(tr, epoch, "train/")
            self.writer.log(va, epoch, "val/")
            if va["AUC_AVG"] > best_auc:
                best_auc = self.best_auc = va["AUC_AVG"]
                # device-side stash; persisted once after the loop
                self.stash_best(epoch, best_auc)
            self.epoch_checkpoint(epoch)
            self.logger.info(
                f"Epoch {epoch}: train loss {tr['loss']:.4f}, "
                f"val AUC_AVG {va['AUC_AVG']:.4f} (best {best_auc:.4f}) "
                f"({(time.time() - t0) / 60:.2f} min)")
            if self.preemption_break(epoch):
                break
        self.write_best()
        self.finish_checkpoints()
        return best_auc

    def write_results(self, data, path: str):
        preds, targets = collect_eval_logits(self, data)
        return write_results_csv(path, preds, targets, probabilities=False)
