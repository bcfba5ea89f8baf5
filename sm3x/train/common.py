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
import jax.numpy as jnp
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
    plus the standard warmup+cosine used by SSL pipelines.

    final_lr=0 (the flag default) is a valid cosine end value — callers
    only reach this under --use-lr-schedule, so there is no constant-lr
    fallback; warmup_epochs=0 skips the warmup ramp entirely instead of
    spending the first step at start_warmup."""
    warm = warmup_epochs * steps_per_epoch
    total = total_epochs * steps_per_epoch
    if warm == 0:
        return optax.cosine_decay_schedule(
            init_value=base_lr,
            decay_steps=max(total, 1),
            alpha=(final_lr / base_lr) if base_lr else 0.0,
        )
    return optax.warmup_cosine_decay_schedule(
        init_value=start_warmup,
        peak_value=base_lr,
        warmup_steps=warm,
        decay_steps=max(total, 2),
        end_value=final_lr,
    )


# ----------------------------------------------------------------------------
# Checkpoint backend shared by all trainers (SURVEY §5 checkpoint/resume)
# ----------------------------------------------------------------------------

class CheckpointableTrainer:
    """Mixin giving every trainer the opt-in Orbax backend
    (``run.ckpt_backend == 'orbax'``: async epoch saves under
    ``<log_path>/orbax_ckpt`` with keep-last-k retention) plus uniform
    msgpack resume. A trainer provides ``_state_tree(epoch)`` /
    ``_restore_state_tree(tree)`` describing its full training state;
    the mixin owns the manager lifecycle and the resume dispatch."""

    _orbax = None
    start_epoch: int = 0

    @property
    def use_orbax(self) -> bool:
        return self.cfg.run.ckpt_backend == "orbax"

    def _place_state(self):
        """Place the live training state onto the mesh. Base placement
        replicates params/batch_stats/opt_state (pure data parallelism);
        trainers with tensor-parallel subtrees override."""
        from sm3x.core.mesh import replicate

        self.state = self.state.replace(
            params=replicate(self.mesh, self.state.params),
            batch_stats=replicate(self.mesh, self.state.batch_stats),
            opt_state=replicate(self.mesh, self.state.opt_state))

    def _state_tree(self, epoch: int) -> dict:
        return {
            "epoch": epoch + 1,
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
        }

    def _restore_state_tree(self, tree: dict):
        from sm3x.utils.checkpoint import restore_into

        opt_state = self.state.opt_state
        if "opt_state" in tree:
            opt_state = restore_into(opt_state, tree["opt_state"])
        self.state = self.state.replace(
            params=restore_into(self.state.params, tree["params"]),
            batch_stats=restore_into(self.state.batch_stats,
                                     tree["batch_stats"]),
            opt_state=opt_state)
        self.start_epoch = int(tree.get("epoch", 0))
        self._place_state()  # restored leaves are host arrays

    def _ckpt_manager(self):
        import os

        from sm3x.utils.checkpoint import OrbaxManager

        if self._orbax is None:
            self._orbax = OrbaxManager(
                os.path.join(self.cfg.run.log_path, "orbax_ckpt"),
                max_to_keep=self.cfg.run.ckpt_keep)
        return self._orbax

    def save_async(self, paths, tree):
        """Write a checkpoint WITHOUT blocking the epoch loop on the
        device->host link (~35 s for the ~600 MB dual-ResNet-50 state
        over a tunneled chip, BENCH.md round 5): snapshot every device
        leaf into fresh buffers (HBM->HBM copy, microseconds — required
        because the live state is donated into the next train step),
        then fetch + serialize + write on a background thread. One
        in-flight save at a time bounds the extra HBM to one state.
        `paths` may be one path or several — several share ONE fetch
        (save_checkpoint_many), the boundary-stall dedupe."""
        import threading

        from sm3x.utils.checkpoint import save_checkpoint_many

        if isinstance(paths, str):
            paths = [paths]
        snap = jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, tree)
        self.flush_saves()  # serialize writes; bound snapshot memory
        t = threading.Thread(target=save_checkpoint_many, args=(paths, snap))
        t.start()
        self._save_thread = t

    def flush_saves(self):
        """Join the in-flight async checkpoint write, surfacing any
        exception location via the thread's join (writes must land
        before exit/preemption/resume)."""
        t = getattr(self, "_save_thread", None)
        if t is not None:
            t.join()
            self._save_thread = None

    def epoch_checkpoint(self, epoch: int):
        """Rolling per-epoch save at ckpt_freq cadence: an orbax step in
        orbax mode, the single checkpoint.msgpack file otherwise (the
        reference overwrites `checkpoint.pth` every epoch,
        backbone_train.py:578-584). Rank-0-only: the state is replicated
        and every rank shares one run dir. msgpack writes go through
        save_async (the epoch loop never blocks on the link)."""
        import os

        from sm3x.parallel.collectives import is_main_process

        if (epoch + 1) % max(self.cfg.run.ckpt_freq, 1) != 0:
            return
        if not is_main_process():
            return
        if self.use_orbax:
            self._ckpt_manager().save(epoch + 1, self._state_tree(epoch))
        else:
            self.save_async(
                os.path.join(self.cfg.run.log_path, "checkpoint.msgpack"),
                self._state_tree(epoch))

    def finish_checkpoints(self):
        self.flush_saves()
        if self._orbax is not None:
            self._orbax.wait()
        # the epoch loop is over; later phases no longer poll the flag
        self.uninstall_preemption_handler()

    def resume_from_orbax(self, directory=None) -> bool:
        """Restore the latest orbax step into the live state (from this
        run's manager, or an explicit prior run's `orbax_ckpt` dir).
        Returns whether anything was restored."""
        from sm3x.utils.checkpoint import OrbaxManager

        if directory is not None:
            mgr = OrbaxManager(directory, max_to_keep=self.cfg.run.ckpt_keep)
        else:
            mgr = self._ckpt_manager()
        tree = mgr.restore()
        if tree is None:
            return False
        self._restore_state_tree(tree)
        self.logger.info(f"resumed from orbax step {mgr.latest_step()} "
                         f"(epoch {self.start_epoch})")
        return True

    def _place_opt_moments(self, spec):
        """Place the optimizer state to mirror a param sharding spec.

        AdamW moments mirror the param tree INSIDE the typed optimizer
        state (mu/nu subtrees, possibly holding MaskedNode placeholders
        under multi_transform). A moment leaf's key path therefore ends
        with its own param's exact key path — match on that suffix (plus
        shape, for safety), NOT on bare shape equality, so a replicated
        param whose shape coincides with a TP weight keeps replicated
        moments (ADVICE round 1)."""
        from sm3x.core.mesh import replicated_sharding
        from jax.tree_util import tree_flatten_with_path, tree_unflatten

        rep = replicated_sharding(self.mesh)

        def keynames(path):
            return tuple(
                getattr(k, "key", getattr(k, "name", getattr(k, "idx", None)))
                for k in path)

        param_flat = tree_flatten_with_path(self.state.params)[0]
        tp_suffixes = [
            (keynames(p), leaf.shape, s)
            for (p, leaf), s in zip(param_flat, jax.tree.leaves(spec))
            if s != rep
        ]
        flat, treedef = tree_flatten_with_path(self.state.opt_state)
        placed = []
        for path, x in flat:
            names = keynames(path)
            sharding = rep
            for suffix, shape, s in tp_suffixes:
                if (len(names) >= len(suffix)
                        and names[-len(suffix):] == suffix
                        and getattr(x, "shape", None) == shape):
                    sharding = s
                    break
            placed.append(jax.device_put(x, sharding))
        return tree_unflatten(treedef, placed)

    def _maybe_tp_state(self, num_labels: int):
        """Tensor-parallel state placement for models carrying the stacked
        (num_labels, ...) MultiLabelProjector (--mesh-model > 1): those
        weights AND their optimizer moments shard the heads dim over the
        "model" mesh axis; everything else replicates. No-op placement-wise
        on a model=1 mesh."""
        from sm3x.core.mesh import label_head_shardings, shard_label_heads

        spec = label_head_shardings(self.mesh, self.state.params, num_labels)
        params = jax.tree.map(jax.device_put, self.state.params, spec)
        batch_stats = shard_label_heads(self.mesh, self.state.batch_stats,
                                        num_labels)
        opt_state = self._place_opt_moments(spec)
        self.state = self.state.replace(
            params=params, batch_stats=batch_stats, opt_state=opt_state)

    def _vit_tp_state(self):
        """Megatron-style TP placement for ViT backbones (--mesh-model > 1
        with a vit_* arch): block attention/MLP weights and their moments
        shard over the "model" axis per sm3x.core.mesh.vit_tp_shardings;
        batch statistics (projector BN only — ViT itself has none)
        replicate."""
        from sm3x.core.mesh import replicate, vit_tp_shardings

        spec = vit_tp_shardings(self.mesh, self.state.params)
        params = jax.tree.map(jax.device_put, self.state.params, spec)
        batch_stats = replicate(self.mesh, self.state.batch_stats)
        opt_state = self._place_opt_moments(spec)
        self.state = self.state.replace(
            params=params, batch_stats=batch_stats, opt_state=opt_state)

    def stash_best(self, epoch: int, best_val_auc: float):
        """Record the current params/batch_stats as the best model using
        DEVICE-side copies (HBM->HBM, microseconds) instead of writing
        best_eval.msgpack inline: the ~12 s device->host fetch + disk
        write per val-AUC improvement stalled the eval epoch loop ~10x
        per run in the round-5 recipe run. Copies are required — the
        live state buffers are donated into the next train step.
        `write_best()` persists the stash once, after the epoch loop."""
        self._best_tree = {
            "epoch": epoch + 1,
            "params": jax.tree.map(jnp.copy, self.state.params),
            "batch_stats": jax.tree.map(jnp.copy, self.state.batch_stats),
            "best_val_auc": best_val_auc,
        }

    def write_best(self):
        """Persist the stashed best model (no-op when nothing improved).
        Called after the epoch loop — including the preemption-break
        path, so a graceful preemption still lands best_eval.msgpack."""
        import os

        from sm3x.utils import save_checkpoint

        from sm3x.parallel.collectives import is_main_process

        tree = getattr(self, "_best_tree", None)
        if tree is None or not is_main_process():
            return
        path = os.path.join(self.cfg.run.log_path, "best_eval.msgpack")
        save_checkpoint(path, tree)
        self._best_tree = None
        self.logger.info(
            f"wrote {path} (epoch {tree['epoch']}, "
            f"val AUC {tree['best_val_auc']:.4f})")

    def warn_unconsumed_lr_schedule(self):
        """--use-lr-schedule is consumed by the SSL trainer only; the other
        stages must say so instead of silently training at constant lr."""
        if getattr(self.cfg.optim, "use_lr_schedule", False):
            self.logger.warning(
                "--use-lr-schedule is only consumed by backbone_train "
                "(SSL pretraining); this stage ignores it and uses a "
                "constant lr")

    def guard_loss(self, epoch: int, loss: float):
        """--nan-guard failure detection: on a non-finite epoch loss, dump
        the full training state for post-mortem and fail fast (the
        reference only appends the traceback to error.log,
        backbone_train.py:633-640). Checked at epoch granularity so the
        deferred-readback hot loop stays free of device->host syncs."""
        import math

        if not getattr(self.cfg.run, "nan_guard", False) or math.isfinite(loss):
            return
        import os

        from sm3x.parallel.collectives import is_main_process
        from sm3x.utils import save_checkpoint

        path = os.path.join(self.cfg.run.log_path, "nan_dump.msgpack")
        if is_main_process():
            save_checkpoint(path, self._state_tree(epoch))
        self.logger.error(
            f"non-finite loss {loss} at epoch {epoch}; state dumped to {path}")
        raise FloatingPointError(
            f"non-finite loss {loss} at epoch {epoch} (state: {path})")

    def install_preemption_handler(self):
        """--save-on-preempt graceful preemption (SURVEY §5 failure
        detection/recovery): SIGTERM/SIGINT set a flag the epoch loop
        polls via `preemption_break`, so a TPU maintenance event's grace
        window turns into a checkpoint + clean exit instead of a lost
        run (the reference's mp.spawn workers die mid-epoch,
        backbone_train.py:626-640). A second signal restores the default
        disposition — the hard-kill escape hatch."""
        import signal
        import threading

        if not getattr(self.cfg.run, "save_on_preempt", False):
            return
        if threading.current_thread() is not threading.main_thread():
            self.logger.warning(
                "--save-on-preempt ignored: trainer not in the main thread")
            return
        self._preempt_signal = None

        def _handler(signum, frame):
            self._preempt_signal = signum
            signal.signal(signum, signal.SIG_DFL)

        self._orig_handlers = {
            sig: signal.signal(sig, _handler)
            for sig in (signal.SIGTERM, signal.SIGINT)}

    def uninstall_preemption_handler(self):
        """Restore the pre-install signal dispositions once the epoch
        loop ends — otherwise a SIGTERM/Ctrl-C during post-fit phases
        (linear probe, results writing) would be swallowed: the handler
        only sets a flag nothing polls anymore."""
        import signal

        for sig, orig in getattr(self, "_orig_handlers", {}).items():
            signal.signal(sig, orig)
        self._orig_handlers = {}

    def preemption_break(self, epoch: int) -> bool:
        """Poll at each epoch boundary: if a preemption signal arrived,
        write the rolling checkpoint NOW (ignoring ckpt_freq), flush any
        async orbax save, and tell the caller to leave the epoch loop.

        Multi-host runs agree first: if ANY process caught a signal,
        every process checkpoints and breaks — a lone breaker would
        leave the others hanging in the next epoch's collectives."""
        signum = getattr(self, "_preempt_signal", None)
        if getattr(self, "_orig_handlers", None) and jax.process_count() > 1:
            import numpy as np
            from jax.experimental import multihost_utils

            flags = np.asarray(multihost_utils.process_allgather(
                np.int32(0 if signum is None else signum)))
            if signum is None and flags.any():
                signum = int(flags[flags != 0][0])  # a peer's signal
        if signum is None:
            return False
        import os

        from sm3x.parallel.collectives import is_main_process
        from sm3x.utils import save_checkpoint

        if not is_main_process():
            # rank 0 owns the shared run dir's files; peers just break
            return True
        self.flush_saves()  # settle in-flight async writes first
        if self.use_orbax:
            mgr = self._ckpt_manager()
            mgr.wait()  # settle in-flight async saves before checking
            if mgr.latest_step() != epoch + 1:  # epoch_checkpoint may have run
                mgr.save(epoch + 1, self._state_tree(epoch))
                mgr.wait()
            where = os.path.join(self.cfg.run.log_path, "orbax_ckpt")
        else:
            where = os.path.join(self.cfg.run.log_path, "checkpoint.msgpack")
            save_checkpoint(where, self._state_tree(epoch))
        self.logger.warning(
            f"preemption signal {signum} caught: epoch {epoch} state saved; "
            f"resume with --resume-path {where}")
        return True

    def resume(self, path=None) -> bool:
        """--resume-path dispatch shared by every CLI: a directory is an
        orbax_ckpt dir, a file is a msgpack training state (the reference's
        restart_from_checkpoint, misc.py:462-494)."""
        import os

        path = path or self.cfg.run.resume_path
        if not path:
            return False
        if os.path.isdir(path):
            if not self.resume_from_orbax(path):
                raise FileNotFoundError(f"no orbax steps in '{path}'")
            return True
        from sm3x.utils.checkpoint import restart_from_checkpoint

        ckpt = restart_from_checkpoint(path, self.logger)
        if ckpt is None:
            raise FileNotFoundError(f"cannot find checkpoint at '{path}'")
        self._restore_state_tree(ckpt)
        self.logger.info(f"resumed from '{path}' (epoch {self.start_epoch})")
        return True
