"""Checkpoint save/restore (SURVEY §5 checkpoint/resume).

Two mechanisms, mirroring the reference:
1. *Training state*: {epoch, params, batch_stats, opt_state} saved each
   epoch + ckp_{N} every save_freq (backbone_train.py:578-592), best-model
   copies keyed on val/AUC_AVG (mlc_eval.py:468-486). Stored as flax
   msgpack (single file, host-independent pytree bytes); `orbax` variants
   provided for async multi-host use.
2. *Cross-stage weight surgery*: the four .pth key conventions are
   handled by sm3x.utils.torch_convert; `export_backbone` reproduces the
   README.md:12 backbone-only export (filter `extractor`/
   `derm_backbone.encoder.*` keys).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    """ONE batched async device->host fetch: jax.device_get starts every
    leaf's copy_to_host_async before blocking, so transfers overlap.
    Leaf-by-leaf np.asarray costs a full device round-trip PER LEAF —
    ~1500 leaves x tunnel RTT made the recipe run's per-epoch rolling
    checkpoint 75 s against 1.2 s of step compute (round 5). The outer
    np.asarray map only normalizes any remaining non-array leaves."""
    return jax.tree.map(np.asarray, jax.device_get(tree))


def save_checkpoint(path: str, tree: Dict[str, Any]):
    """Atomic msgpack write of a host pytree. Tuples/namedtuples (optax
    states) pass through flax's state-dict form; restore structured
    leaves with `restore_into` when a typed target is available."""
    return save_checkpoint_many([path], tree)[0]


def save_checkpoint_many(paths, tree: Dict[str, Any]):
    """One device fetch + one serialization, written to every path
    (atomic each). A training-loop boundary often owes the SAME state to
    two files (the rolling checkpoint.msgpack and the ckp_N milestone);
    fetching the ~600 MB state once instead of per-file halves the
    boundary stall on a bandwidth-bound link (BENCH.md round 5)."""
    state = serialization.to_state_dict(_to_host(tree))
    data = serialization.msgpack_serialize(state)
    for path in paths:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    return list(paths)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_into(target, state_dict):
    """Rebuild a typed pytree (e.g. an optax state) from its state-dict
    form, using `target` for structure."""
    return serialization.from_state_dict(target, state_dict)


class OrbaxManager:
    """Orbax checkpoint manager (SURVEY §5: 'Orbax checkpoint-manager with
    --resume parity') — async multi-host-safe saves with keep-last-k
    retention; the msgpack path above remains the single-host default."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.manager = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, tree):
        # flax state-dict form first: pure nested dicts round-trip through
        # orbax; raw optax NamedTuples come back as lists with None leaves
        # that `restore_into` cannot consume
        state = serialization.to_state_dict(_to_host(tree))
        self.manager.save(step, args=self._ocp.args.StandardSave(state))

    def restore(self, step: Optional[int] = None):
        step = self.manager.latest_step() if step is None else step
        if step is None:
            return None
        return self.manager.restore(step)

    def latest_step(self):
        return self.manager.latest_step()

    def wait(self):
        self.manager.wait_until_finished()

    def close(self):
        self.manager.close()


def restart_from_checkpoint(path: str, logger=None) -> Optional[Dict[str, Any]]:
    """Warm-restart loader (misc.py:462-494): missing file is fatal there;
    here we return None and let the caller decide."""
    if not os.path.isfile(path):
        if logger:
            logger.warning(f"cannot find checkpoint at '{path}'")
        return None
    if logger:
        logger.info(f"Re-starting from checkpoint: '{path}' ...")
    return load_checkpoint(path)


def copy_best(src: str, dst: str):
    """best_eval.pth copy convention (backbone_train.py:406-410)."""
    shutil.copyfile(src, dst)


def export_backbone(params: dict, batch_stats: dict):
    """Backbone-only export: keep the dual encoders, drop projectors and
    heads (README.md:12 'filter the extractor key')."""

    def keep(tree):
        out = {}
        for mod in ("derm_backbone", "clinic_backbone"):
            if mod in tree:
                sub = tree[mod]
                out[mod] = {"encoder": sub["encoder"]} if "encoder" in sub else sub
        if "extractor" in tree:
            out["extractor"] = keep(tree["extractor"])
        return out

    return {"params": keep(params), "batch_stats": keep(batch_stats)}


def load_torch_ssl_checkpoint(path: str, arch: str = "resnet50",
                              shared_cross_proj: bool = False,
                              with_projectors: bool = True):
    """Stage-1 .pth -> SimCLRSkinV3/V32 trees (mlc_train.py:341-346 load)."""
    from sm3x.utils import torch_convert as tc

    sd = tc.load_torch_state_dict(path)
    return tc.convert_simclr_skin(sd, arch, shared_cross_proj, with_projectors)


def load_torch_mlc_checkpoint(path: str, arch: str = "resnet50",
                              variant: str = "v4", num_labels: int = 8):
    """best_linear.pth / best_finetune.pth -> MLCModel trees
    (inference.py:122-127 load, encoder-prefix strip included)."""
    from sm3x.utils import torch_convert as tc

    sd = tc.load_torch_state_dict(path)
    return tc.convert_mlc_model(sd, arch=arch, num_labels=num_labels,
                                variant=variant, strip_encoder=True)
