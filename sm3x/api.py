"""Packaged public inference API (the importable core of the repo-root
`inference.py`, which mirrors /root/reference/inference.py's surface).

Living inside the package means installed console scripts (sm3x-serve)
can use it without the repo root on sys.path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sm3x import NUM_CLASSES
from sm3x.models.mlc import MLCModel
from sm3x.utils.checkpoint import load_torch_mlc_checkpoint, load_checkpoint


def build_evaluator(arch="resnet50", mlc_proj_dim=512, num_labels=8,
                    l2_norm=False, num_heads=1, sa_dim_ff=128, sa_dropout=0.1,
                    dtype=jnp.bfloat16):
    """The released configuration (reference inference.py:99-120)."""
    return MLCModel(
        arch=arch, proj_dim=mlc_proj_dim, num_labels=num_labels,
        mlc_proj="v4", l2_norm=l2_norm, n_heads=num_heads,
        sa_dim_ff=sa_dim_ff, sa_dropout=sa_dropout,
        use_prototype_bias=True, num_classes=tuple(NUM_CLASSES), dtype=dtype,
    )


def load_weights(pretrain_path: str, arch: str = "resnet50"):
    """-> {"params": ..., "batch_stats": ...}; accepts the released torch
    .pth (strict key mapping incl. encoder-strip) or an sm3x msgpack."""
    if pretrain_path.endswith(".msgpack"):
        ckpt = load_checkpoint(pretrain_path)
        return {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
    params, stats = load_torch_mlc_checkpoint(pretrain_path, arch, variant="v4")
    return {"params": params, "batch_stats": stats}


def predict_fn(model, variables):
    """Jitted (derm, clinic) NHWC float batches -> list of 8 logits."""

    @jax.jit
    def fwd(derm, clinic):
        _, preds = model.apply(variables, derm, clinic)
        return preds

    return fwd


__all__ = ["build_evaluator", "load_weights", "predict_fn"]
