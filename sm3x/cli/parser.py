"""Argparse surface mirroring the reference's shared `get_parser`
(src/utils/misc.py:106-225) plus the per-tool extensions, so run.sh
recipes translate flag-for-flag. GPU-specific flags (port, dist-url,
rank, workers-per-process) are accepted for compatibility but map onto
the single-controller JAX runtime (mesh shape instead of process ranks).
"""

from __future__ import annotations

import argparse

from sm3x.core.config import (
    DataConfig, ModelConfig, OptimConfig, RunConfig,
    SSLConfig, MLCTrainConfig, EvalConfig,
)


def get_parser(desc: str = "sm3x training") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)

    # data
    p.add_argument("--data-name", type=str, default="SevenPCBaseDataset")
    p.add_argument("--data-path", type=str, default="./data/7PC")
    p.add_argument("--img-sz", nargs=2, type=int, default=[224, 224])
    p.add_argument("--n-classes", type=int, default=None)
    p.add_argument("--mean", nargs=3, type=float, default=[0.485, 0.456, 0.406])
    p.add_argument("--std", nargs=3, type=float, default=[0.229, 0.224, 0.225])
    p.add_argument("--cache-size", type=int, default=320,
                   help="host decode canvas (TPU pipeline)")
    p.add_argument("--no-cache-images", dest="cache_images",
                   action="store_false", default=True,
                   help="decode batches just-in-time instead of building "
                   "the RAM canvas cache (splits beyond host RAM; "
                   "sm3x.data.streaming)")
    p.add_argument("--device-feed", type=str, default="auto",
                   choices=["auto", "resident", "prefetch", "host"],
                   help="device-feeding strategy: HBM-resident canvases, "
                   "async host->device prefetch, blocking per-step upload, "
                   "or auto (resident when it fits --hbm-data-budget-mb)")
    p.add_argument("--hbm-data-budget-mb", type=int, default=4096,
                   help="HBM the canvas cache may occupy before auto "
                   "feeding falls back to async prefetch")
    p.add_argument("--prefetch-depth", type=int, default=2,
                   help="batches transferred ahead by the prefetch feed")
    # multi-crop recipe, consumed with --data-name SevenPCSwavDataset
    # (group 0 = the two global views; further groups are local crops)
    p.add_argument("--size-crops", nargs="*", type=int, default=[224, 96])
    p.add_argument("--nmb-crops", nargs="*", type=int, default=[2, 6])
    p.add_argument("--min-scale-crops", nargs="*", type=float,
                   default=[0.5, 0.14])
    p.add_argument("--max-scale-crops", nargs="*", type=float,
                   default=[1.0, 0.5])
    p.add_argument("--local-loss-weight", type=float, default=1.0,
                   help="weight of each multi-crop local-view NT-Xent "
                   "term (SSL pretraining with SevenPCSwavDataset only)")

    # model
    p.add_argument("-a", "--arch", default="resnet18", type=str)
    p.add_argument("--finetune", default="fc", type=str)

    # optim
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("-b", "--batch-size", default=64, type=int,
                   help="GLOBAL batch size (split over the data mesh axis)")
    p.add_argument("-lr", "--base-lr", default=1e-3, type=float)
    p.add_argument("--final-lr", type=float, default=0)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--wd", default=5e-2, type=float)
    p.add_argument("--warmup-epochs", default=10, type=int)
    p.add_argument("--start-warmup", default=0, type=float)
    p.add_argument("--use-lr-schedule", action="store_true",
                   help="warmup+cosine decay (base-lr -> final-lr over "
                   "--epochs with --warmup-epochs); SSL pretraining "
                   "(backbone_train) only — other stages warn and ignore "
                   "it. Without it the warmup/final-lr flags are accepted "
                   "but unused, matching the reference")

    # mesh / distribution (replaces port/dist-url/rank/world-size)
    p.add_argument("--mesh-data", type=int, default=None,
                   help="data-parallel mesh axis size (default: all devices)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="model/tensor-parallel mesh axis size")
    p.add_argument("--world-size", default=None, type=int,
                   help="logical world size for local-negative parity")
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host bring-up: coordinator address "
                   "'host:port' for jax.distributed (the reference's "
                   "--dist-url, misc.py:402-410); run the SAME command on "
                   "every host with its --process-id")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total process (host) count for --coordinator")
    p.add_argument("--process-id", type=int, default=None,
                   help="this host's rank for --coordinator")

    # misc
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("-j", "--workers", default=8, type=int)
    p.add_argument("--save-freq", type=int, default=50)
    p.add_argument("--ckpt-freq", type=int, default=1,
                   help="rolling checkpoint cadence (epochs)")
    p.add_argument("--ckpt-backend", choices=("msgpack", "orbax"),
                   default="msgpack",
                   help="rolling-state backend: single-file msgpack or "
                   "async orbax CheckpointManager (keep-last-k)")
    p.add_argument("--ckpt-keep", type=int, default=3,
                   help="orbax max_to_keep")
    p.add_argument("--print-freq", type=int, default=50)
    p.add_argument("--nan-guard", action="store_true",
                   help="abort with a state dump when an epoch loss goes "
                   "non-finite (failure detection; checked at epoch "
                   "granularity so the deferred-readback hot loop stays "
                   "free of device->host syncs)")
    p.add_argument("--save-on-preempt", action="store_true",
                   help="on SIGTERM/SIGINT, write the rolling checkpoint at "
                   "the next epoch boundary and exit cleanly (graceful "
                   "TPU-preemption handling; resume with --resume-path)")
    p.add_argument("--use-pallas-augment", action="store_true",
                   help="fused Pallas photometric augmentation kernel "
                   "(one HBM round-trip per image)")
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute (TPU analogue of CUDA fp16 AMP)")
    p.add_argument("--resume-path", type=str, default=None)
    p.add_argument("--pretrain-path", type=str, default=None)
    p.add_argument("--log-path", type=str, default="./logs")
    p.add_argument("--logger-name", type=str, default=None)
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--run-group", default=None, type=str)
    p.add_argument("--run-name", default=None, type=str)
    p.add_argument("--run-tag", nargs="*", default=None, type=str)
    p.add_argument("--run-type", default="train", type=str)
    p.add_argument("--comments", default="sm3x training", type=str)
    p.add_argument("--proj-name", type=str, default="sm3x")
    return p


def base_configs(args) -> tuple:
    data = DataConfig(
        data_name=args.data_name, data_path=args.data_path,
        img_sz=tuple(args.img_sz), n_classes=args.n_classes,
        mean=tuple(args.mean), std=tuple(args.std),
        cache_size=args.cache_size,
        cache_images=getattr(args, "cache_images", True),
        device_feed=getattr(args, "device_feed", "auto"),
        hbm_data_budget_mb=getattr(args, "hbm_data_budget_mb", 4096),
        prefetch_depth=getattr(args, "prefetch_depth", 2),
        size_crops=tuple(getattr(args, "size_crops", (224, 96))),
        nmb_crops=tuple(getattr(args, "nmb_crops", (2, 6))),
        min_scale_crops=tuple(getattr(args, "min_scale_crops", (0.5, 0.14))),
        max_scale_crops=tuple(getattr(args, "max_scale_crops", (1.0, 0.5))),
    )
    optim = OptimConfig(
        epochs=args.epochs, batch_size=args.batch_size, base_lr=args.base_lr,
        final_lr=args.final_lr, momentum=args.momentum, wd=args.wd,
        warmup_epochs=args.warmup_epochs, start_warmup=args.start_warmup,
        use_lr_schedule=getattr(args, 'use_lr_schedule', False),
        amp=args.amp,
        label_weights=tuple(getattr(args, "label_weights", (1.0,) * 8)),
    )
    run = RunConfig(
        seed=args.seed, workers=args.workers, save_freq=args.save_freq,
        ckpt_freq=getattr(args, "ckpt_freq", 1),
        ckpt_backend=getattr(args, "ckpt_backend", "msgpack"),
        ckpt_keep=getattr(args, "ckpt_keep", 3),
        print_freq=args.print_freq, nan_guard=getattr(args, 'nan_guard', False),
        save_on_preempt=getattr(args, 'save_on_preempt', False),
        resume_path=args.resume_path,
        pretrain_path=args.pretrain_path, log_path=args.log_path,
        logger_name=args.logger_name, tensorboard=args.tensorboard,
        wandb=args.wandb, proj_name=args.proj_name, run_group=args.run_group,
        run_name=args.run_name, run_type=args.run_type, comments=args.comments,
        mesh_data=args.mesh_data, mesh_model=args.mesh_model,
        world_size=args.world_size,
    )
    return data, optim, run


def ssl_config(args) -> SSLConfig:
    data, optim, run = base_configs(args)
    model = ModelConfig(
        arch=args.arch, arch_version=args.arch_version,
        arch_weights=args.arch_weights, proj_dim=args.proj_dim,
        temperature=args.temperature, use_checkpoint=args.use_checkpoint,
        num_labels=args.num_labels,
        use_pallas_ntxent=getattr(args, "use_pallas_ntxent", False),
        use_pallas_augment=getattr(args, "use_pallas_augment", False),
        local_loss_weight=getattr(args, "local_loss_weight", 1.0),
        bn_stat_freq=getattr(args, "bn_stat_freq", 1),
        negatives=getattr(args, "negatives", "local"),
    )
    return SSLConfig(data=data, model=model, optim=optim, run=run,
                     modality_weights=tuple(args.modality_weights))


def mlc_train_config(args) -> MLCTrainConfig:
    data, optim, run = base_configs(args)
    model = ModelConfig(
        arch=args.arch, num_labels=args.num_labels,
        extractor_proj_dim=args.extractor_proj_dim, mlc_proj=args.mlc_proj,
        mlc_proj_dim=args.mlc_proj_dim, num_heads=args.num_heads,
        sa_dim_ff=args.sa_dim_ff, sa_dropout=args.sa_dropout,
        temperature=args.temperature, l2_norm=args.l2_norm,
        finetune_backbone=args.finetune_backbone,
        use_pallas_augment=getattr(args, "use_pallas_augment", False),
    )
    return MLCTrainConfig(data=data, model=model, optim=optim, run=run,
                          extractor_weights=args.extractor_weights)


def eval_config(args, train_sz=None, test_sz=None) -> EvalConfig:
    data, optim, run = base_configs(args)
    model = ModelConfig(
        arch=args.arch, finetune=args.finetune,
        num_labels=getattr(args, "num_labels", 8),
        extractor_proj_dim=getattr(args, "extractor_proj_dim", 128),
        mlc_proj=getattr(args, "mlc_proj", "v4"),
        mlc_proj_dim=getattr(args, "mlc_proj_dim", 512),
        num_heads=getattr(args, "num_heads", 1),
        sa_dim_ff=getattr(args, "sa_dim_ff", 128),
        sa_dropout=getattr(args, "sa_dropout", 0.1),
        l2_norm=getattr(args, "l2_norm", False),
        init_prototype=getattr(args, "init_prototype", False),
        use_pallas_augment=getattr(args, "use_pallas_augment", False),
    )
    return EvalConfig(
        data=data, model=model, optim=optim, run=run,
        train_sz=train_sz or getattr(args, "train_sz", 224),
        test_sz=test_sz or getattr(args, "test_sz", 224),
    )
