"""Supervised train/eval loops shared by mlc_eval, backbone_eval and the
in-tool linear probe (reference tools/mlc_eval.py:113-269,
tools/backbone_eval.py:215-430, tools/backbone_train.py:142-426).

One jitted train step: fused augmentation -> forward -> per-label
weighted CE -> AdamW(masked) update; one jitted eval step: deterministic
resize -> forward. Epoch-end metrics run on the host over the collected
logits (the eval sets are a few hundred rows), with wrap-padded rows
masked out — the reference's per-rank metric quirk (SURVEY §7) is
resolved to a single-host full-set eval, which is what inference.py
measures and the CSVs record.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Sequence

import jax
import numpy as np

from sm3x.core import prng
from sm3x.core.mesh import shard_batch
from sm3x.losses import weighted_multilabel_ce
from sm3x.parallel import host_gather_tree
from sm3x.metrics import compute_stage_metrics, mean_average_precision
from sm3x.ops.augment import ssl_augment_batch, eval_resize_batch
from sm3x.utils import AverageMeter


def make_supervised_steps(
    apply_train: Callable,   # (params, batch_stats, d, c, dropout_rng) -> (preds, new_stats)
    apply_eval: Callable,    # (params, batch_stats, d, c) -> preds
    label_weights: Sequence[float],
    mean, std, train_aug, eval_size=(224, 224), aug_fn=ssl_augment_batch,
    joint_aug: bool = False,
):
    from sm3x.ops.augment import modality_keys, modality_valid_hw

    label_weights = tuple(float(w) for w in label_weights)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, derm, derm_hw, clinic, clinic_hw, labels, rng):
        kd, kc, kdrop = jax.random.split(rng, 3)
        kd, kc = modality_keys(kd, kc, joint_aug)
        d_hw, c_hw = modality_valid_hw(derm_hw, clinic_hw, joint_aug)
        d = aug_fn(kd, derm, d_hw, mean, std, train_aug)
        c = aug_fn(kc, clinic, c_hw, mean, std, train_aug)

        def loss_fn(params):
            preds, new_stats = apply_train(params, state.batch_stats, d, c, kdrop)
            loss = weighted_multilabel_ce(preds, labels, label_weights)
            return loss, (new_stats, preds)

        (loss, (new_stats, preds)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, loss, [jax.lax.stop_gradient(p) for p in preds]

    @jax.jit
    def eval_step(params, batch_stats, derm, derm_hw, clinic, clinic_hw):
        d = eval_resize_batch(derm, derm_hw, mean, std, eval_size)
        c = eval_resize_batch(clinic, clinic_hw, mean, std, eval_size)
        return apply_eval(params, batch_stats, d, c)

    return train_step, eval_step


def run_train_epoch(trainer, data, epoch: int) -> dict:
    cfg = trainer.cfg
    losses = AverageMeter("Loss", ":.4f")
    all_preds: List[List[np.ndarray]] = []
    all_targets = []
    all_masks = []
    pending = []
    for it, batch in enumerate(
            data.batches(cfg.optim.batch_size, epoch, cfg.run.seed)):
        rng = prng.step_rng(trainer.rng, epoch, it)
        db = shard_batch(trainer.mesh, {
            "derm": batch.derm, "derm_hw": batch.derm_hw,
            "clinic": batch.clinic, "clinic_hw": batch.clinic_hw,
            "label": batch.label.astype(np.int32)})
        trainer.state, loss, preds = trainer.train_step(
            trainer.state, db["derm"], db["derm_hw"],
            db["clinic"], db["clinic_hw"], db["label"], rng)
        # defer every device->host readback to epoch end: a float()/gather
        # per step blocks the dispatch pipeline on a device round-trip
        # (dominant on a tunneled TPU), and on multi-host each gather is
        # a collective — batching them after the last step keeps the
        # steps free-running (same discipline as the SSL/MLC loops)
        pending.append((loss, batch.derm.shape[0]))
        all_preds.append(preds)
        all_targets.append(batch.label)
        all_masks.append(batch.mask)
    for loss, n in pending:
        losses.update(float(loss), n)
    # one batched gather of the whole epoch's predictions: multi-host
    # processes only hold their addressable shards; metrics run on the
    # full set on every host
    all_preds = host_gather_tree(all_preds)
    stats = _epoch_metrics(all_preds, all_targets, all_masks)
    stats["loss"] = losses.avg
    return stats


def run_eval_epoch(trainer, data, epoch: int = 0) -> dict:
    cfg = trainer.cfg
    all_preds: List[List[np.ndarray]] = []
    all_targets = []
    all_masks = []
    for batch in data.batches(cfg.optim.batch_size, epoch=0,
                              seed=cfg.run.seed, shuffle=False):
        db = shard_batch(trainer.mesh, {
            "derm": batch.derm, "derm_hw": batch.derm_hw,
            "clinic": batch.clinic, "clinic_hw": batch.clinic_hw})
        preds = trainer.eval_step(
            trainer.state.params, trainer.state.batch_stats,
            db["derm"], db["derm_hw"], db["clinic"], db["clinic_hw"])
        all_preds.append(preds)  # device arrays; gathered after the loop
        all_targets.append(batch.label)
        all_masks.append(batch.mask)
    all_preds = host_gather_tree(all_preds)
    return _epoch_metrics(all_preds, all_targets, all_masks)


def collect_eval_logits(trainer, data):
    """(preds_list, targets) over the full split, padding removed —
    feeds sm3x.metrics.results_table for CSV emission."""
    cfg = trainer.cfg
    all_preds, all_targets, all_masks = [], [], []
    for batch in data.batches(cfg.optim.batch_size, epoch=0,
                              seed=cfg.run.seed, shuffle=False):
        db = shard_batch(trainer.mesh, {
            "derm": batch.derm, "derm_hw": batch.derm_hw,
            "clinic": batch.clinic, "clinic_hw": batch.clinic_hw})
        preds = trainer.eval_step(
            trainer.state.params, trainer.state.batch_stats,
            db["derm"], db["derm_hw"], db["clinic"], db["clinic_hw"])
        all_preds.append(preds)  # device arrays; gathered after the loop
        all_targets.append(batch.label)
        all_masks.append(batch.mask)
    all_preds = host_gather_tree(all_preds)
    return _concat_masked(all_preds, all_targets, all_masks)


def _concat_masked(all_preds, all_targets, all_masks):
    mask = np.concatenate(all_masks)
    num_labels = len(all_preds[0])
    preds = [np.concatenate([p[i] for p in all_preds])[mask]
             for i in range(num_labels)]
    targets = np.concatenate(all_targets)[mask]
    return preds, targets


def _epoch_metrics(all_preds, all_targets, all_masks) -> dict:
    preds, targets = _concat_masked(all_preds, all_targets, all_masks)
    # eval loops hold raw logits: state it, don't let the torchmetrics
    # [0,1]-heuristic guess (it mis-reads early-training logits)
    stats = compute_stage_metrics(preds, targets, probabilities=False)
    stats.update(mean_average_precision(preds, targets, probabilities=False))
    return stats
