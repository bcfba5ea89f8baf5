"""Shared training machinery: train state with batch statistics,
optimizer construction (AdamW parity), freeze-policy masks.

The reference freezes parameters with requires_grad flags and passes only
trainable params to AdamW (mlc_eval.py:374-388,406). Functionally that is
an optimizer mask: frozen leaves get zero updates AND no weight decay —
`optax.multi_transform` over a boolean path mask reproduces it exactly.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_adamw(lr: float, wd: float = 5e-2, eps: float = 1e-8,
               mask_tree=None) -> optax.GradientTransformation:
    """torch.optim.AdamW parity: betas (0.9, 0.999), decoupled wd applied
    to every trainable tensor (torch default decays ALL params, including
    biases/BN — unlike common JAX recipes, so no bias exclusion here).
    backbone_train.py:526 uses eps=1e-5; other stages the 1e-8 default."""
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=eps, weight_decay=wd)
    if mask_tree is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", mask_tree),
        )
    return tx


def path_mask(params, predicate: Callable[[str], bool]):
    """Boolean mask pytree: predicate gets the '/'-joined parameter path."""

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}{k}/") for k, v in tree.items()}
        return predicate(prefix.rstrip("/"))

    return walk(params)


# ----------------------------------------------------------------------------
# Freeze policies (path predicates over the sm3x parameter trees)
# ----------------------------------------------------------------------------

def ssl_trainable(_path: str) -> bool:
    """Stage-1 trains everything."""
    return True


def mlc_train_trainable(path: str, finetune_backbone: bool = False) -> bool:
    """mlc_train.py:347-348: freeze the whole extractor unless
    --finetune-backbone; the head always trains. Note the prototype
    weights are ALSO k-means-overwritten each epoch regardless."""
    if path.startswith("extractor/"):
        return finetune_backbone
    return True


def mlc_eval_trainable(path: str, finetune: str = "projector") -> bool:
    """mlc_eval.py:374-388 freeze policies:
      fc        -> only the prototype heads train
      projector -> the whole head (projectors+sa+prototypes) trains
      all       -> head + encoder layer1-4 train; the stem stays frozen
    """
    if finetune == "fc":
        return path.startswith("head/prototypes/")
    if finetune == "projector":
        return path.startswith("head/")
    if finetune == "all":
        if path.startswith("head/"):
            return True
        if path.startswith("extractor/"):
            # stem (conv1/bn1) frozen; residual stages train
            return "/encoder/layer" in path
        return False
    raise ValueError(f"unknown finetune policy {finetune!r}")


def backbone_eval_trainable(path: str, finetune: str = "fc") -> bool:
    """backbone_eval: '--finetune fc' freezes both backbones
    (tools/backbone_eval.py:302-304), anything else trains all."""
    if finetune == "fc":
        return path.startswith("classifier/")
    return True


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def warmup_cosine_schedule(base_lr: float, final_lr: float, warmup_epochs: int,
                           total_epochs: int, steps_per_epoch: int,
                           start_warmup: float = 0.0):
    """The reference exposes warmup/final-lr flags (misc.py:144-154) though
    its shipped recipes use a constant lr; provide the schedule for parity
    plus the standard warmup+cosine used by SSL pipelines."""
    warm = warmup_epochs * steps_per_epoch
    total = total_epochs * steps_per_epoch
    if warm == 0 and final_lr == 0:
        return base_lr
    return optax.warmup_cosine_decay_schedule(
        init_value=start_warmup,
        peak_value=base_lr,
        warmup_steps=max(warm, 1),
        decay_steps=max(total, 2),
        end_value=final_lr,
    )
