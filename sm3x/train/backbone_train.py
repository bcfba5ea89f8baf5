"""Stage-1 SSL pretraining (reference tools/backbone_train.py).

TPU-first layout: ONE jitted program per step does everything after the
uint8 canvas upload — 2 augmented views per modality (fused augmentation,
sm3x.ops.augment), 4 encoder passes, 3 NT-Xent losses, backward, AdamW
update. The batch is sharded over the mesh "data" axis; params are
replicated; GSPMD inserts the grad psum and the global-batch BN stats
(SyncBN parity with backbone_train.py:510) automatically.
"""

from __future__ import annotations

import time
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from sm3x.core import prng
from sm3x.core.cache import enable_compilation_cache
from sm3x.core.mesh import make_mesh, shard_batch
from sm3x.losses.ssl import ssl_loss
from sm3x.models.simclr import build_ssl_model
from sm3x.ops.augment import SSL_AUG, get_ssl_augment_fn
from sm3x.train import common
from sm3x.utils.logging import StatWriter
from sm3x.utils import AverageMeter, ProgressMeter, setup_logger, save_checkpoint


def make_ssl_train_step(model, style: int, temperature: float, groups: int,
                        mean, std, aug_cfg=SSL_AUG, use_pallas: bool = False,
                        use_pallas_aug: bool = False, mesh=None,
                        multicrop=None, frozen_bn: bool = False,
                        modality_weights=(1.0, 1.0),
                        joint_aug: bool = False):
    """Returns jitted (state, canvases..., rng) -> (state, metrics).

    `joint_aug`: SevenPCBaseDataset2 semantics (reference
    datasets.py:573-605) — the derm/clinic pair shares every random
    augmentation parameter per view (sm3x.ops.augment.modality_keys) and
    crops within the common valid region (modality_valid_hw). Selected by
    --data-name SevenPCBaseDataset2.

    `frozen_bn`: the --bn-stat-freq fast step — forward with eval-mode BN
    (normalize with running statistics; no batch-stat pass, so the conv
    epilogue fuses the normalize and the backward loses the
    batch-correlation reductions) while still taking the full gradient
    step. `state.batch_stats` passes through unchanged; the caller runs
    the standard step every K-th iteration to refresh the EMA.

    `multicrop`: None, or a dict with size_crops/nmb_crops/min_scale_crops/
    max_scale_crops/local_weight (the SevenPCSwavDataset recipe): crop
    group 0 configures the two global views; each further group adds
    nmb_crops[i] local views at size_crops[i], every one an extra
    encoder+projector pass whose NT-Xent pairs it with global view 1 of
    its modality (sm3x.losses.ssl). All views of all resolutions run in
    the SAME jitted program — static shapes per resolution group."""
    import dataclasses as _dc

    _aug = get_ssl_augment_fn(use_pallas_aug, mesh)

    local_weight = 1.0
    if multicrop is not None:
        sizes = tuple(multicrop["size_crops"])
        counts = tuple(multicrop["nmb_crops"])
        los = tuple(multicrop["min_scale_crops"])
        his = tuple(multicrop["max_scale_crops"])
        if not (len(sizes) == len(counts) == len(los) == len(his)):
            raise ValueError("size/nmb/min-scale/max-scale crop lists must "
                             f"have equal lengths, got {sizes}/{counts}/"
                             f"{los}/{his}")
        if counts[0] != 2:
            raise ValueError(f"crop group 0 is the two global SimCLR views; "
                             f"--nmb-crops must start with 2, got {counts}")
        local_weight = float(multicrop.get("local_weight", 1.0))
        aug_cfg = _dc.replace(aug_cfg, out_size=(sizes[0], sizes[0]),
                              rrc_scale=(los[0], his[0]))

        def augment_multicrop(rng, canvases, hw):
            """All views (globals first) via the shared multi-crop op."""
            from sm3x.ops.augment import multicrop_augment_batch

            views = multicrop_augment_batch(
                rng, canvases, hw, mean, std, size_crops=sizes,
                nmb_crops=counts, min_scale_crops=los, max_scale_crops=his,
                base_cfg=aug_cfg, aug_fn=_aug)
            return views[0], views[1], views[2:]

    def augment_views(rng, canvases, hw):
        k1, k2 = jax.random.split(rng)
        v1 = _aug(k1, canvases, hw, mean, std, aug_cfg)
        v2 = _aug(k2, canvases, hw, mean, std, aug_cfg)
        return v1, v2

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, derm, derm_hw, clinic, clinic_hw, rng):
        from sm3x.ops.augment import modality_keys, modality_valid_hw

        kd, kc = jax.random.split(rng)
        kd, kc = modality_keys(kd, kc, joint_aug)
        d_hw, c_hw = modality_valid_hw(derm_hw, clinic_hw, joint_aug)
        if multicrop is not None:
            d1, d2, d_locals = augment_multicrop(kd, derm, d_hw)
            c1, c2, c_locals = augment_multicrop(kc, clinic, c_hw)
        else:
            d1, d2 = augment_views(kd, derm, d_hw)
            c1, c2 = augment_views(kc, clinic, c_hw)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if frozen_bn:
                if multicrop is not None:
                    outs = model.apply(variables, (d1, d2), (c1, c2),
                                       d_locals, c_locals, train=False,
                                       method="multicrop")
                else:
                    outs = model.apply(variables, (d1, d2), (c1, c2),
                                       train=False)
                new_stats = state.batch_stats
            elif multicrop is not None:
                outs, mut = model.apply(
                    variables, (d1, d2), (c1, c2), d_locals, c_locals,
                    train=True, mutable=["batch_stats"], method="multicrop",
                )
                new_stats = mut["batch_stats"]
            else:
                outs, mut = model.apply(
                    variables, (d1, d2), (c1, c2), train=True,
                    mutable=["batch_stats"],
                )
                new_stats = mut["batch_stats"]
            total, parts = ssl_loss(outs, style, temperature, groups,
                                    modality_weights=modality_weights,
                                    use_pallas=use_pallas,
                                    local_weight=local_weight)
            return total, (new_stats, parts)

        (loss, (new_stats, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        metrics = {"loss": loss, **parts}
        return state, metrics

    return train_step




def make_trimodal_train_step(model, temperature: float, groups: int,
                             mean, std, aug_cfg=SSL_AUG,
                             use_pallas_aug: bool = False, mesh=None,
                             joint_aug: bool = False):
    """Tri-modal (derm + clinic + patient metadata) SSL step — the
    BASELINE.json stretch goal. Same fused-augmentation front end as the
    dual-modal step; the metadata branch gets two stochastic dropout
    views (its augmentation analogue) and all cross-modal NT-Xent pairs
    (sm3x.models.trimodal.trimodal_ssl_loss)."""
    from sm3x.models.trimodal import trimodal_ssl_loss

    _aug = get_ssl_augment_fn(use_pallas_aug, mesh)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, derm, derm_hw, clinic, clinic_hw, meta, rng):
        from sm3x.ops.augment import modality_keys, modality_valid_hw

        kd, kc, kdrop = jax.random.split(rng, 3)
        kd, kc = modality_keys(kd, kc, joint_aug)
        d_hw, c_hw = modality_valid_hw(derm_hw, clinic_hw, joint_aug)
        kd1, kd2 = jax.random.split(kd)
        kc1, kc2 = jax.random.split(kc)
        d1 = _aug(kd1, derm, d_hw, mean, std, aug_cfg)
        d2 = _aug(kd2, derm, d_hw, mean, std, aug_cfg)
        c1 = _aug(kc1, clinic, c_hw, mean, std, aug_cfg)
        c2 = _aug(kc2, clinic, c_hw, mean, std, aug_cfg)

        def loss_fn(params):
            outs, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                (d1, d2), (c1, c2), meta, train=True,
                mutable=["batch_stats"], rngs={"dropout": kdrop},
            )
            total, parts = trimodal_ssl_loss(outs, temperature, groups)
            return total, (mut["batch_stats"], parts)

        (loss, (new_stats, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, {"loss": loss, **parts}

    return train_step


class SSLTrainer(common.CheckpointableTrainer):
    """Owns mesh/model/state and the epoch loop (reference main,
    backbone_train.py:429-608)."""

    def __init__(self, cfg, mesh=None, logger=None):
        enable_compilation_cache()
        self.cfg = cfg
        self.mesh = mesh or make_mesh(model=cfg.run.mesh_model)
        self.logger = logger or setup_logger(cfg.run.log_path, "sm3x.ssl")
        self.writer = StatWriter(cfg.run.log_path, cfg.run.tensorboard,
                                 cfg.run.wandb, cfg.run.proj_name)
        m = cfg.model
        from sm3x.core.precision import policy_for

        self.policy = policy_for(cfg.optim.amp)
        self.is_trimodal = m.arch_version == "trimodal"
        self.bn_stat_freq = max(1, int(getattr(m, "bn_stat_freq", 1)))
        if self.bn_stat_freq > 1 and self.is_trimodal:
            raise ValueError(
                "--bn-stat-freq applies to the dual-modal SSL step only "
                "(the trimodal step's dropout views need train-mode "
                "forward)")
        # multi-crop with ViT backbones works since the pos_embed learned
        # at the global resolution is bilinearly interpolated to each
        # local-view grid (sm3x/models/vit.py) — no arch guard needed.
        # ViT default activation-memory mode: 'attn' (recompute only the
        # attention internals in the backward — frees the (B,H,S,S) probs
        # residuals). Measured uniformly faster than save-all on TPU
        # (BENCH.md round 4: +3.9% at b=64, +9.0% at b=128) with
        # IDENTICAL numerics — it is a residual policy, not a math
        # change. Opt out with --use-checkpoint off.
        self._use_checkpoint = m.use_checkpoint
        if self._use_checkpoint is False and str(m.arch).startswith("vit"):
            self._use_checkpoint = "attn"
            self.logger.info(
                "ViT backbone: defaulting --use-checkpoint to 'attn' "
                "(BENCH.md round 4; pass --use-checkpoint off for XLA "
                "save-all residuals)")
        elif self._use_checkpoint == "off":
            self._use_checkpoint = False
        if self.is_trimodal:
            # the BASELINE.json stretch goal: dual images + patient
            # metadata third modality (sm3x/models/trimodal.py)
            from sm3x.models.trimodal import TriModalSimCLR

            self.model = TriModalSimCLR(
                arch=m.arch, proj_dim=m.proj_dim,
                meta_vocab_sizes=tuple(m.meta_vocab_sizes),
                dtype=self.policy.compute_dtype, remat=self._use_checkpoint)
            self.style = 0
        else:
            self.model, self.style = build_ssl_model(
                m.arch_version, m.arch, m.proj_dim,
                dtype=self.policy.compute_dtype,
                remat=self._use_checkpoint,
            )
        # per-device-negatives parity: world_size groups (SURVEY §2c)
        data_shards = int(self.mesh.devices.shape[0])
        self.groups = cfg.run.world_size or data_shards
        if m.negatives == "global":
            self.groups = 1

        self.rng = prng.root_key(cfg.run.seed)
        img = (2, cfg.data.img_sz[0], cfg.data.img_sz[1], 3)
        init_rng = jax.random.fold_in(self.rng, 0)
        dummy = jnp.zeros(img, jnp.float32)
        # jit the init: un-jitted flax init dispatches op-by-op (minutes
        # over a tunneled TPU); jitted it is one compile
        if self.is_trimodal:
            codes = jnp.zeros((2, len(m.meta_vocab_sizes)), jnp.int32)
            variables = jax.jit(
                lambda r: self.model.init(
                    {"params": r, "dropout": r}, (dummy, dummy),
                    (dummy, dummy), codes, train=False))(init_rng)
        else:
            variables = jax.jit(
                lambda r: self.model.init(r, (dummy, dummy), (dummy, dummy),
                                          train=False))(init_rng)
        # --arch-weights: initialize both encoders from a torch ResNet
        # state-dict. Accepts a .pth path OR a torchvision enum name
        # ('IMAGENET1K_V1', the reference run.sh:11 syntax) resolved
        # against staged local files with a sha256 integrity check
        # (sm3x.utils.weight_registry — the reference's vendored enum
        # tables, src/models/resnet.py:339-671).
        if m.arch_weights:
            from sm3x.utils import torch_convert as _tc
            from sm3x.utils.weight_registry import resolve_arch_weights

            weights_path = resolve_arch_weights(str(m.arch_weights), m.arch)
            sd = _tc.load_torch_state_dict(weights_path)
            ep, es = _tc.convert_resnet(sd, m.arch)
            for mod in ("derm_backbone", "clinic_backbone"):
                variables["params"][mod]["encoder"] = jax.tree.map(
                    jnp.asarray, ep)
                variables["batch_stats"][mod]["encoder"] = jax.tree.map(
                    jnp.asarray, es)
            self.logger.info(
                f"initialized encoders from '{weights_path}' "
                f"(--arch-weights {m.arch_weights})")

        tx = common.make_adamw(cfg.optim.base_lr, cfg.optim.wd,
                               eps=cfg.optim.adam_eps)
        self.state = common.create_train_state(self.model, variables, tx)
        self._place_state()
        import dataclasses as _dc

        aug_cfg = _dc.replace(SSL_AUG, out_size=tuple(cfg.data.img_sz))
        # --data-name SevenPCBaseDataset2: the pair shares augmentation
        # params per view (reference datasets.py:573-605 transforms the
        # stacked derm+clinic tensor in ONE call)
        joint_aug = cfg.data.data_name == "SevenPCBaseDataset2"
        if joint_aug:
            self.logger.info(
                "SevenPCBaseDataset2: joint per-pair augmentation "
                "(derm and clinic share crop/flip/jitter params)")
        multicrop = None
        if cfg.data.data_name == "SevenPCSwavDataset":
            # the multi-crop dataset name selects the SwAV-style step:
            # crop group 0 = the two globals, further groups = locals
            multicrop = {
                "size_crops": cfg.data.size_crops,
                "nmb_crops": cfg.data.nmb_crops,
                "min_scale_crops": cfg.data.min_scale_crops,
                "max_scale_crops": cfg.data.max_scale_crops,
                "local_weight": m.local_loss_weight,
            }
            self.logger.info(
                f"multi-crop SSL: sizes {cfg.data.size_crops}, counts "
                f"{cfg.data.nmb_crops}, local weight {m.local_loss_weight}")
        if self.is_trimodal:
            if multicrop is not None:
                raise ValueError("multi-crop (SevenPCSwavDataset) and "
                                 "--arch-version trimodal are not "
                                 "combinable")
            self.train_step = make_trimodal_train_step(
                self.model, m.temperature, self.groups,
                tuple(cfg.data.mean), tuple(cfg.data.std), aug_cfg,
                use_pallas_aug=m.use_pallas_augment, mesh=self.mesh,
                joint_aug=joint_aug)
        else:
            self.train_step = make_ssl_train_step(
                self.model, self.style, m.temperature, self.groups,
                tuple(cfg.data.mean), tuple(cfg.data.std), aug_cfg,
                use_pallas=m.use_pallas_ntxent,
                use_pallas_aug=m.use_pallas_augment, mesh=self.mesh,
                multicrop=multicrop,
                modality_weights=tuple(cfg.modality_weights),
                joint_aug=joint_aug)
        # --bn-stat-freq K>1 (off-recipe): every K-th step refreshes BN
        # batch statistics; the rest run the eval-BN fast step
        self.fast_step = None
        if self.bn_stat_freq > 1:
            self.fast_step = make_ssl_train_step(
                self.model, self.style, m.temperature, self.groups,
                tuple(cfg.data.mean), tuple(cfg.data.std), aug_cfg,
                use_pallas=m.use_pallas_ntxent,
                use_pallas_aug=m.use_pallas_augment, mesh=self.mesh,
                multicrop=multicrop, frozen_bn=True,
                modality_weights=tuple(cfg.modality_weights),
                joint_aug=joint_aug)
            self.logger.info(
                f"bn-stat-freq {self.bn_stat_freq}: BN statistics refresh "
                f"every {self.bn_stat_freq} steps (EXPERIMENTAL, "
                f"off-recipe; running stats lag up to "
                f"{self.bn_stat_freq - 1} steps — measured harmful to "
                f"feature quality in a learning-regime grid, BENCH.md "
                f"round 4)")
        self.start_epoch = 0

    def _place_state(self):
        """SSL placement: ViT backbones get Megatron-style TP over the
        "model" mesh axis (the large-batch stretch scaling axis); ResNet
        backbones (and model=1 meshes) replicate as before."""
        if (int(self.mesh.shape["model"]) > 1
                and str(self.cfg.model.arch).startswith("vit")):
            self._vit_tp_state()
        else:
            super()._place_state()

    def train_epoch(self, data, epoch: int) -> dict:
        cfg = self.cfg
        losses = AverageMeter("Loss", ":.4f")
        batch_time = AverageMeter("Time", ":6.3f")
        n_steps = data.steps_per_epoch(cfg.optim.batch_size)
        progress = ProgressMeter(n_steps, [batch_time, losses],
                                 prefix=f"Train epoch: [{epoch}]")
        end = time.time()
        # defer scalar readbacks to the epoch end: a float() per step costs
        # a full device->host round-trip (dominant on a tunneled TPU)
        pending = []
        for it, batch in enumerate(
                data.batches(cfg.optim.batch_size, epoch, cfg.run.seed)):
            rng = prng.step_rng(self.rng, epoch, it)
            device_batch = shard_batch(self.mesh, {
                "derm": batch.derm, "derm_hw": batch.derm_hw,
                "clinic": batch.clinic, "clinic_hw": batch.clinic_hw,
            })
            if self.is_trimodal:
                if batch.meta is None:
                    raise ValueError(
                        "--arch-version trimodal needs a dataset with "
                        "metadata codes (Derm7pt SevenPCBaseDataset "
                        "provides them); this batch has none")
                meta = shard_batch(self.mesh,
                                   {"meta": np.asarray(batch.meta)})["meta"]
                self.state, metrics = self.train_step(
                    self.state, device_batch["derm"], device_batch["derm_hw"],
                    device_batch["clinic"], device_batch["clinic_hw"],
                    meta, rng)
            else:
                step_fn = self.train_step
                if self.fast_step is not None and it % self.bn_stat_freq:
                    step_fn = self.fast_step
                self.state, metrics = step_fn(
                    self.state, device_batch["derm"], device_batch["derm_hw"],
                    device_batch["clinic"], device_batch["clinic_hw"], rng)
            pending.append((metrics["loss"], batch.derm.shape[0]))
            batch_time.update(time.time() - end)
            end = time.time()
            if it % cfg.run.print_freq == 0 and it > 0:
                # drain the deferred device scalars so the live display
                # shows a moving loss: these steps already executed, so
                # this is ONE host sync per print_freq steps, not per step
                for loss, n in pending:
                    losses.update(float(loss), n)
                pending.clear()
                self.logger.info(progress.display(it))
        for loss, n in pending:
            losses.update(float(loss), n)
        return {"loss": losses.avg}

    def save(self, path: str, epoch: int):
        """Synchronous single-shot save (external callers); the epoch
        loop uses save_async."""
        save_checkpoint(path, self._state_tree(epoch))

    def _apply_lr_schedule(self, steps_per_epoch: int):
        """Opt-in warmup+cosine schedule (--use-lr-schedule): rebuild the
        optimizer with the step-indexed schedule once steps_per_epoch is
        known. Fresh runs only — a resumed run keeps its optimizer state
        (the schedule's count restarts, so resuming mid-schedule with this
        flag is refused rather than silently wrong)."""
        o = self.cfg.optim
        if self.start_epoch > 0:
            raise ValueError(
                "--use-lr-schedule cannot resume mid-run: the schedule "
                "count restarts at 0; rerun from scratch or drop the flag")
        schedule = common.warmup_cosine_schedule(
            o.base_lr, o.final_lr, o.warmup_epochs, o.epochs,
            steps_per_epoch, o.start_warmup)
        tx = common.make_adamw(schedule, o.wd, eps=o.adam_eps)
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        self.state = common.create_train_state(self.model, variables, tx)
        self._place_state()
        self.logger.info(
            f"lr schedule: warmup {o.warmup_epochs} epochs "
            f"({o.start_warmup} -> {o.base_lr}), cosine to {o.final_lr} "
            f"over {o.epochs} epochs x {steps_per_epoch} steps")

    def fit(self, data):
        cfg = self.cfg
        import os

        from sm3x.data.prefetch import wrap_from_config

        # HBM-resident canvases when they fit, async host->device
        # prefetch otherwise; --device-feed overrides (sm3x.data.prefetch)
        data = wrap_from_config(data, self.mesh, cfg.data)
        self.install_preemption_handler()
        if cfg.optim.use_lr_schedule:
            self._apply_lr_schedule(data.steps_per_epoch(cfg.optim.batch_size))
        for epoch in range(self.start_epoch, cfg.optim.epochs):
            t0 = time.time()
            stat = self.train_epoch(data, epoch)
            self.guard_loss(epoch, stat["loss"])
            self.writer.log(stat, epoch, "ssl_train/")
            self.logger.info(
                f"Epoch {epoch}: loss {stat['loss']:.4f} "
                f"({(time.time() - t0) / 60:.2f} min)")
            from sm3x.parallel.collectives import is_main_process

            milestone = ((epoch + 1) % cfg.run.save_freq == 0
                         or (epoch + 1) == cfg.optim.epochs)
            rolling_due = (epoch + 1) % max(cfg.run.ckpt_freq, 1) == 0
            if milestone and is_main_process():
                # async ~600 MB fetch overlaps the next epochs; when the
                # rolling checkpoint is due the SAME epoch it shares the
                # one fetch (identical state) instead of a second stall
                paths = [os.path.join(cfg.run.log_path,
                                      f"ckp_{epoch}.msgpack")]
                if rolling_due and not self.use_orbax:
                    paths.append(os.path.join(cfg.run.log_path,
                                              "checkpoint.msgpack"))
                self.save_async(paths, self._state_tree(epoch))
            if not (milestone and rolling_due and not self.use_orbax):
                self.epoch_checkpoint(epoch)
            if self.preemption_break(epoch):
                break
        self.finish_checkpoints()
        return self.state
