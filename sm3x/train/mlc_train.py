"""Stage-2 DeepCluster MLC training (reference tools/mlc_train.py).

TPU re-design of the stateful DeepCluster loop (SURVEY §7 hard parts):
* the full-dataset embedding memory bank is a device-resident
  (heads, N, proj_dim) array carried through the jitted train step and
  updated in-place with donated buffers (mlc_train.py:269-274);
* the per-epoch spherical k-means is a jitted lax.fori_loop over MXU
  matmuls (sm3x.ops.kmeans) — no rank-0 gather/broadcast: the same
  deterministic program runs replicated, so every chip already has the
  centroids (vs. dist.gather/broadcast in mlc_train.py:137-186);
* centroids are written straight into the prototype kernels
  (prototypes.weight.copy_() at :187 becomes a functional param update).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from sm3x import NUM_CLASSES
from sm3x.core import prng
from sm3x.core.cache import enable_compilation_cache
from sm3x.core.mesh import make_mesh, replicate, shard_batch
from sm3x.core.precision import policy_for
from sm3x.losses import cluster_ce
from sm3x.models.mlc import MLCModel
from sm3x.ops.augment import MLC_TRAIN_AUG, ssl_augment_batch
from sm3x.ops.kmeans import spherical_kmeans
from sm3x.train import common
from sm3x.data.prefetch import wrap_from_config
from sm3x.utils.logging import StatWriter
from sm3x.utils import AverageMeter, ProgressMeter, setup_logger


def make_mlc_train_step(model, temperature: float, mean, std, aug_cfg,
                        finetune_backbone: bool, aug_fn=ssl_augment_batch,
                        joint_aug: bool = False):
    from sm3x.ops.augment import modality_keys, modality_valid_hw

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(state, bank, derm, derm_hw, clinic, clinic_hw,
                   index, assignments, rng):
        kd, kc, kdrop = jax.random.split(rng, 3)
        kd, kc = modality_keys(kd, kc, joint_aug)
        d_hw, c_hw = modality_valid_hw(derm_hw, clinic_hw, joint_aug)
        d = aug_fn(kd, derm, d_hw, mean, std, aug_cfg)
        c = aug_fn(kc, clinic, c_hw, mean, std, aug_cfg)

        def loss_fn(params):
            (sa, preds), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                d, c,
                extractor_train=finetune_backbone,
                head_train=True,
                stop_extractor_grad=not finetune_backbone,
                mutable=["batch_stats"],
                rngs={"dropout": kdrop},
            )
            losses = [
                cluster_ce(preds[i], assignments[i, index], temperature)
                for i in range(len(preds))
            ]
            loss = jnp.mean(jnp.stack(losses))
            return loss, (mut["batch_stats"], sa)

        (loss, (new_stats, sa)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        # memory-bank slot update (mlc_train.py:269-274)
        bank = bank.at[:, index].set(jax.lax.stop_gradient(sa))
        return state, bank, loss

    return train_step


def make_embed_step(model, mean, std, aug_cfg, aug_fn=ssl_augment_batch,
                    joint_aug: bool = False):
    """init_memory pass (mlc_train.py:92-113): train-mode modules (the
    reference never switches to eval before the init pass), no gradient."""
    from sm3x.ops.augment import modality_keys, modality_valid_hw

    @jax.jit
    def embed(params, batch_stats, derm, derm_hw, clinic, clinic_hw, rng):
        kd, kc, kdrop = jax.random.split(rng, 3)
        kd, kc = modality_keys(kd, kc, joint_aug)
        d_hw, c_hw = modality_valid_hw(derm_hw, clinic_hw, joint_aug)
        d = aug_fn(kd, derm, d_hw, mean, std, aug_cfg)
        c = aug_fn(kc, clinic, c_hw, mean, std, aug_cfg)
        (sa, _), mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, d, c,
            extractor_train=True, head_train=True, stop_extractor_grad=True,
            mutable=["batch_stats"], rngs={"dropout": kdrop},
        )
        return sa, mut["batch_stats"]

    return embed


def cluster_and_update(rng, bank, params, num_classes=tuple(NUM_CLASSES),
                       iters: int = 10):
    """Per-head spherical k-means; write centroids into prototype kernels
    and return assignments (heads, N) int32.

    Only the 8 tiny (dim, C_i) prototype kernels are replaced — the rest
    of the tree (two ResNet-50s, ~200 MB) passes through untouched, so
    callers can hand in the live device tree without any device->host
    round-trip. Each new kernel inherits the old kernel's placement."""
    n_heads = bank.shape[0]
    assignments = []
    protos = dict(params["head"]["prototypes"])
    for i, k in enumerate(num_classes):
        cent, a = spherical_kmeans(
            jax.random.fold_in(rng, i), bank[i % n_heads], k, iters)
        old = protos[f"proto{i}"]["kernel"]
        kernel = cent.T.astype(old.dtype)
        if hasattr(old, "sharding"):
            kernel = jax.device_put(kernel, old.sharding)
        protos[f"proto{i}"] = dict(protos[f"proto{i}"], kernel=kernel)
        assignments.append(a)
    head = dict(params["head"], prototypes=protos)
    params = dict(params, head=head)
    return params, jnp.stack(assignments)




class MLCTrainer(common.CheckpointableTrainer):
    """Owns the DeepCluster loop (reference main, mlc_train.py:288-442)."""

    def __init__(self, cfg, mesh=None, logger=None, extractor_tree=None):
        enable_compilation_cache()
        self.cfg = cfg
        self.mesh = mesh or make_mesh(model=cfg.run.mesh_model)
        self.logger = logger or setup_logger(cfg.run.log_path, "sm3x.mlc")
        self.writer = StatWriter(cfg.run.log_path, cfg.run.tensorboard,
                                 cfg.run.wandb, cfg.run.proj_name)
        m = cfg.model
        self.policy = policy_for(cfg.optim.amp)
        self.model = MLCModel(
            arch=m.arch, proj_dim=m.mlc_proj_dim, num_labels=m.num_labels,
            mlc_proj=m.mlc_proj, l2_norm=m.l2_norm, n_heads=m.num_heads,
            sa_dim_ff=m.sa_dim_ff, sa_dropout=m.sa_dropout,
            use_prototype_bias=False, num_classes=tuple(m.num_classes),
            dtype=self.policy.compute_dtype,
        )
        self.rng = prng.root_key(cfg.run.seed)
        img = (2, cfg.data.img_sz[0], cfg.data.img_sz[1], 3)
        dummy = jnp.zeros(img, jnp.float32)
        variables = jax.jit(lambda r: self.model.init(
            {"params": r, "dropout": self.rng},
            dummy, dummy, extractor_train=False, head_train=False))(
                jax.random.fold_in(self.rng, 0))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        # stage-1 weight import: full state then null projectors
        # (mlc_train.py:341-346) == keep only the encoders
        if extractor_tree is not None:
            ep, es = extractor_tree
            for mod in ("derm_backbone", "clinic_backbone"):
                params["extractor"][mod]["encoder"] = ep[mod]["encoder"]
                batch_stats["extractor"][mod]["encoder"] = es[mod]["encoder"]

        mask = common.path_mask(
            params, lambda p: common.mlc_train_trainable(p, m.finetune_backbone))
        tx = common.make_adamw(cfg.optim.base_lr, cfg.optim.wd, mask_tree=mask)
        self.state = common.create_train_state(
            self.model, {"params": params, "batch_stats": batch_stats}, tx)
        self._place_state()

        aug_cfg = dataclasses.replace(MLC_TRAIN_AUG, out_size=tuple(cfg.data.img_sz))
        from sm3x.ops.augment import get_ssl_augment_fn

        aug_fn = get_ssl_augment_fn(m.use_pallas_augment, self.mesh)
        joint_aug = cfg.data.data_name == "SevenPCBaseDataset2"
        self.train_step = make_mlc_train_step(
            self.model, m.temperature, tuple(cfg.data.mean), tuple(cfg.data.std),
            aug_cfg, m.finetune_backbone, aug_fn=aug_fn, joint_aug=joint_aug)
        self.embed_step = make_embed_step(
            self.model, tuple(cfg.data.mean), tuple(cfg.data.std), aug_cfg,
            aug_fn=aug_fn, joint_aug=joint_aug)
        self.bank = None

    def _place_state(self):
        # stacked per-label projectors shard over the "model" axis
        self._maybe_tp_state(self.cfg.model.num_labels)

    def _state_tree(self, epoch: int):
        """Full DeepCluster state: the memory bank is a training-state leaf
        (SURVEY §7 'bank as training-state leaf') so an orbax resume skips
        the init_memory pass and continues mid-schedule."""
        tree = super()._state_tree(epoch)
        if self.bank is not None:
            tree["bank"] = self.bank
        return tree

    def _restore_state_tree(self, tree):
        super()._restore_state_tree(tree)
        if "bank" in tree and tree["bank"] is not None:
            self.bank = replicate(self.mesh, jnp.asarray(tree["bank"]))

    def init_memory(self, data):
        cfg = self.cfg
        n = data.n
        bank = np.zeros((cfg.model.num_labels, n, cfg.model.mlc_proj_dim),
                        np.float32)
        bs = cfg.optim.batch_size
        stats = self.state.batch_stats
        for it, batch in enumerate(data.batches(bs, epoch=0, seed=cfg.run.seed)):
            rng = prng.step_rng(jax.random.fold_in(self.rng, 999), 0, it)
            db = shard_batch(self.mesh, {
                "derm": batch.derm, "derm_hw": batch.derm_hw,
                "clinic": batch.clinic, "clinic_hw": batch.clinic_hw})
            sa, stats = self.embed_step(
                self.state.params, stats, db["derm"], db["derm_hw"],
                db["clinic"], db["clinic_hw"], rng)
            # host_gather, not np.asarray: on multi-host runs the embed
            # output is batch-sharded across processes and each host only
            # holds its addressable rows
            from sm3x.parallel import host_gather

            bank[:, batch.index] = host_gather(sa)
        self.state = self.state.replace(batch_stats=stats)
        self.bank = replicate(self.mesh, jnp.asarray(bank))
        self.logger.info("Initializion of the memory banks done.")

    def train_epoch(self, data, epoch: int) -> dict:
        cfg = self.cfg
        # epoch-boundary clustering (mlc_train.py:219-229)
        # the live device tree goes straight in: cluster_and_update only
        # swaps the prototype kernels (placed like the old ones), so the
        # ~200 MB of backbone params never round-trip through the host
        params, assignments = cluster_and_update(
            prng.fold_in_axis(jax.random.fold_in(self.rng, epoch), "kmeans"),
            self.bank, self.state.params,
            tuple(cfg.model.num_classes), cfg.kmeans_iters)
        self.state = self.state.replace(params=params)
        assignments = replicate(self.mesh, assignments)
        self.logger.info(f"Clustering for epoch {epoch} done.")

        losses = AverageMeter("Loss", ":.4f")
        n_steps = data.steps_per_epoch(cfg.optim.batch_size)
        progress = ProgressMeter(n_steps, [losses],
                                 prefix=f"Train epoch: [{epoch}]")
        pending = []
        for it, batch in enumerate(
                data.batches(cfg.optim.batch_size, epoch, cfg.run.seed)):
            rng = prng.step_rng(self.rng, epoch, it)
            db = shard_batch(self.mesh, {
                "derm": batch.derm, "derm_hw": batch.derm_hw,
                "clinic": batch.clinic, "clinic_hw": batch.clinic_hw})
            idx = replicate(self.mesh, jnp.asarray(batch.index))
            self.state, self.bank, loss = self.train_step(
                self.state, self.bank, db["derm"], db["derm_hw"],
                db["clinic"], db["clinic_hw"], idx, assignments, rng)
            pending.append((loss, batch.derm.shape[0]))
            if it % cfg.run.print_freq == 0 and it > 0:
                # drain the deferred scalars: one host sync per print_freq
                # steps keeps the live display showing a moving loss
                for loss, n in pending:
                    losses.update(float(loss), n)
                pending.clear()
                self.logger.info(progress.display(it))
        for loss, n in pending:  # deferred readback (one RTT, not per-step)
            losses.update(float(loss), n)
        return {"loss": losses.avg}

    def fit(self, data):
        import os

        cfg = self.cfg
        self.warn_unconsumed_lr_schedule()
        data = wrap_from_config(data, self.mesh, cfg.data)
        self.install_preemption_handler()
        if self.bank is None:
            self.init_memory(data)
        for epoch in range(self.start_epoch, cfg.optim.epochs):
            t0 = time.time()
            stat = self.train_epoch(data, epoch)
            self.guard_loss(epoch, stat["loss"])
            self.writer.log(stat, epoch, "ssl_train/")
            self.logger.info(
                f"Epoch {epoch}: loss {stat['loss']:.4f} "
                f"({(time.time() - t0) / 60:.2f} min)")
            self.epoch_checkpoint(epoch)
            from sm3x.parallel.collectives import is_main_process

            if ((epoch + 1) % cfg.run.save_freq == 0
                    or (epoch + 1) == cfg.optim.epochs) and is_main_process():
                # cross-stage surgery milestone (mlc_eval loads params +
                # batch_stats from these; the full resumable state lives in
                # the rolling epoch_checkpoint); async — overlaps epochs
                self.save_async(
                    os.path.join(cfg.run.log_path, f"ckp_{epoch}.msgpack"),
                    {"epoch": epoch + 1,
                     "params": self.state.params,
                     "batch_stats": self.state.batch_stats})
            if self.preemption_break(epoch):
                break
        self.finish_checkpoints()
        return self.state
