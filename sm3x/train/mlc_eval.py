"""Supervised finetune/eval of the MLC model (reference tools/mlc_eval.py
— produces best_linear/best_finetune). Freeze policies fc|projector|all
(mlc_eval.py:374-388) become optimizer masks + BN/dropout mode flags."""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp

from sm3x import METRICS_NAME, CLASSES_NAME
from sm3x.core import prng
from sm3x.core.cache import enable_compilation_cache
from sm3x.core.mesh import make_mesh
from sm3x.core.precision import policy_for
from sm3x.models.mlc import MLCModel
from sm3x.ops.augment import FINETUNE_AUG
from sm3x.train import common
from sm3x.train.supervised import (
    make_supervised_steps, run_train_epoch, run_eval_epoch, collect_eval_logits,
)
from sm3x.utils.logging import StatWriter
from sm3x.utils import (
    BestRecorder, setup_logger, create_eval_stat,
)
from sm3x.metrics import write_results_csv
from sm3x.data.prefetch import resident_nbytes, wrap_from_config




class MLCEvalTrainer(common.CheckpointableTrainer):
    def __init__(self, cfg, mesh=None, logger=None, pretrained_tree=None):
        enable_compilation_cache()
        self.cfg = cfg
        self.mesh = mesh or make_mesh(model=cfg.run.mesh_model)
        self.logger = logger or setup_logger(cfg.run.log_path, "sm3x.mlc_eval")
        self.writer = StatWriter(cfg.run.log_path, cfg.run.tensorboard,
                                 cfg.run.wandb, cfg.run.proj_name)
        m = cfg.model
        self.policy = policy_for(cfg.optim.amp)
        self.model = MLCModel(
            arch=m.arch, proj_dim=m.mlc_proj_dim, num_labels=m.num_labels,
            mlc_proj=m.mlc_proj, l2_norm=m.l2_norm, n_heads=m.num_heads,
            sa_dim_ff=m.sa_dim_ff, sa_dropout=m.sa_dropout,
            use_prototype_bias=True, num_classes=tuple(m.num_classes),
            dtype=self.policy.compute_dtype,
        )
        self.rng = prng.root_key(cfg.run.seed)
        dummy = jnp.zeros((2, cfg.data.img_sz[0], cfg.data.img_sz[1], 3), jnp.float32)
        variables = jax.jit(lambda r: self.model.init(
            {"params": r, "dropout": self.rng}, dummy, dummy))(
                jax.random.fold_in(self.rng, 0))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        if pretrained_tree is not None:
            # strict=False load with logged missing keys (mlc_eval.py:358-362):
            # graft whatever subtrees the checkpoint provides.
            pp, ps = pretrained_tree
            params = _graft(params, pp, self.logger)
            batch_stats = _graft(batch_stats, ps, self.logger)
        if m.init_prototype:
            # fresh prototype heads (mlc_eval.py:369-372)
            fresh = jax.jit(lambda r: self.model.init(
                {"params": r, "dropout": self.rng}, dummy, dummy))(
                    jax.random.fold_in(self.rng, 1))["params"]["head"]["prototypes"]
            params["head"]["prototypes"] = fresh

        mask = common.path_mask(
            params, lambda p: common.mlc_eval_trainable(p, m.finetune))
        tx = common.make_adamw(cfg.optim.base_lr, cfg.optim.wd, mask_tree=mask)
        self.state = common.create_train_state(
            self.model, {"params": params, "batch_stats": batch_stats}, tx)
        self._place_state()

        # BN/dropout submodule modes per policy (mlc_eval.py:125-139)
        ext_train = m.finetune == "all"
        head_train = m.finetune in ("projector", "all")
        model = self.model

        def apply_train(params, batch_stats, d, c, kdrop):
            (sa, preds), mut = model.apply(
                {"params": params, "batch_stats": batch_stats}, d, c,
                extractor_train=ext_train, head_train=head_train,
                stop_extractor_grad=(m.finetune != "all"),
                mutable=["batch_stats"], rngs={"dropout": kdrop})
            return preds, mut["batch_stats"]

        def apply_eval(params, batch_stats, d, c):
            _, preds = model.apply(
                {"params": params, "batch_stats": batch_stats}, d, c)
            return preds

        aug = dataclasses.replace(
            FINETUNE_AUG, out_size=(cfg.train_sz, cfg.train_sz))
        from sm3x.ops.augment import get_ssl_augment_fn

        self.train_step, self.eval_step = make_supervised_steps(
            apply_train, apply_eval, cfg.optim.label_weights,
            tuple(cfg.data.mean), tuple(cfg.data.std), aug,
            (cfg.test_sz, cfg.test_sz),
            aug_fn=get_ssl_augment_fn(m.use_pallas_augment, self.mesh),
            joint_aug=cfg.data.data_name == "SevenPCBaseDataset2")

        self.best_auc = 0.0

    def _place_state(self):
        # stacked per-label projectors shard over the "model" axis
        self._maybe_tp_state(self.cfg.model.num_labels)

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
        summary = {}
        for prefix in ("train", "val"):
            summary.update(create_eval_stat(prefix, METRICS_NAME, CLASSES_NAME, "max"))
        summary.update({"train/loss": "min", "val/loss": "min"})
        summary = {k: BestRecorder(v) for k, v in summary.items()}
        best_auc = self.best_auc
        for epoch in range(self.start_epoch, cfg.optim.epochs):
            t0 = time.time()
            tr = run_train_epoch(self, train_data, epoch)
            self.guard_loss(epoch, tr["loss"])
            va = run_eval_epoch(self, val_data, epoch)
            self.writer.log(tr, epoch, "train/")
            self.writer.log(va, epoch, "val/")
            for k, v in tr.items():
                if f"train/{k}" in summary:
                    summary[f"train/{k}"].update(v)
            for k, v in va.items():
                if f"val/{k}" in summary:
                    summary[f"val/{k}"].update(v)
            is_best = va["AUC_AVG"] > best_auc
            if is_best:
                best_auc = self.best_auc = va["AUC_AVG"]
                # device-side stash; persisted once after the loop
                self.stash_best(epoch, best_auc)
            self.epoch_checkpoint(epoch)
            self.logger.info(
                f"Epoch {epoch}: train loss {tr['loss']:.4f}, "
                f"val AUC_AVG {va['AUC_AVG']:.4f} (best {best_auc:.4f}) "
                f"({(time.time() - t0) / 60:.2f} min)")
            # full per-metric/per-label table (the reference prints it every
            # epoch, mlc_eval.py:490-501) at DEBUG verbosity
            from sm3x.utils import generate_stat_text

            self.logger.debug(
                "--------------------- Summary Statistics ----------------\n"
                + generate_stat_text(tr, va, summary, METRICS_NAME, CLASSES_NAME))
            if self.preemption_break(epoch):
                break
        self.write_best()
        self.finish_checkpoints()
        return best_auc

    def write_results(self, data, path: str):
        preds, targets = collect_eval_logits(self, data)
        return write_results_csv(path, preds, targets, probabilities=False)


def _graft(dst: dict, src: dict, logger=None, path: str = ""):
    """Recursively copy matching keys (strict=False load semantics);
    log what's missing from the checkpoint. A dict-vs-leaf structure
    mismatch fails HERE with the key path — silently grafting an array
    over a params subtree surfaces later as an opaque apply error."""
    out = dict(dst)
    for k, v in dst.items():
        if k in src:
            if isinstance(v, dict) != isinstance(src[k], dict):
                raise ValueError(
                    f"checkpoint structure mismatch at {path}{k}: model has "
                    f"{'a subtree' if isinstance(v, dict) else 'a leaf'} but "
                    f"the checkpoint holds "
                    f"{'a subtree' if isinstance(src[k], dict) else 'a leaf'}"
                )
            if isinstance(v, dict):
                out[k] = _graft(v, src[k], logger, f"{path}{k}/")
            else:
                leaf = jnp.asarray(src[k])
                dst_shape = getattr(v, "shape", None)
                if dst_shape is not None and leaf.shape != dst_shape:
                    raise ValueError(
                        f"checkpoint shape mismatch at {path}{k}: model "
                        f"expects {tuple(dst_shape)} but the checkpoint "
                        f"holds {tuple(leaf.shape)} — check --mlc-proj-dim/"
                        f"--sa-dim-ff/--arch match the checkpointed run")
                out[k] = leaf
        elif logger is not None:
            logger.warning(f"Missing key in checkpoint: {path}{k}")
    return out
