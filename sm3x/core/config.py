"""Dataclass configs mirroring every flag of the reference's `get_parser`
(/root/reference/src/utils/misc.py:106-225) plus the per-tool extensions,
so that `run.sh` recipes translate 1:1 onto the TPU build.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

from sm3x import NUM_CLASSES


@dataclasses.dataclass
class DataConfig:
    # data parameters (misc.py:112-122)
    data_name: str = "SevenPCBaseDataset"
    data_path: str = "./data/7PC"
    img_sz: Tuple[int, int] = (224, 224)
    n_classes: Optional[int] = None
    # dataset statistics from run.sh:5 (Derm7pt)
    mean: Tuple[float, float, float] = (0.7833, 0.6712, 0.6026)
    std: Tuple[float, float, float] = (0.2139, 0.2472, 0.2571)
    # TPU input-pipeline knobs (new): decode once, cache as uint8, augment
    # on device. `cache_size` is the square canvas the host decodes into.
    cache_images: bool = True
    cache_size: int = 320
    # device-feeding strategy (sm3x.data.prefetch.wrap_for_device):
    # auto = HBM-resident when the canvas cache fits the budget, else
    # async prefetch; resident/prefetch/host force one strategy (host =
    # blocking per-step upload). The reference's analogue knob is the
    # DataLoader worker count (misc.py:450-458).
    device_feed: str = "auto"
    hbm_data_budget_mb: int = 4096
    prefetch_depth: int = 2
    # black-border crop (datasets.py:499)
    crop_amount: int = 25
    # SwAV-style multi-crop recipe, consumed when --data-name
    # SevenPCSwavDataset (reference datasets.py:608-707 reads identically
    # named args its own parser never defines — the dataset is
    # CLI-unreachable there; sm3x defines the flags with SwAV defaults).
    # Group 0 = the two global views; further groups are local crops.
    size_crops: Tuple[int, ...] = (224, 96)
    nmb_crops: Tuple[int, ...] = (2, 6)
    min_scale_crops: Tuple[float, ...] = (0.5, 0.14)
    max_scale_crops: Tuple[float, ...] = (1.0, 0.5)


@dataclasses.dataclass
class ModelConfig:
    arch: str = "resnet50"
    arch_version: str = "v32"          # backbone_train.py:613
    arch_weights: Optional[str] = None  # "IMAGENET1K_V1" in run.sh:11
    proj_dim: int = 128                # SSL projector output dim
    temperature: float = 0.1           # run.sh:9
    # activation-memory strategy: False | True (full per-block remat) |
    # "dots" (selective policy remat) | "attn" (recompute only the
    # attention internals in backward) | "flash" (fused Pallas
    # flash-attention kernel, TPU; "attn"/"flash" are ViT backbones
    # only — see the ladder in models/vit.py)
    use_checkpoint: Union[bool, str] = False
    finetune: str = "fc"               # fc | projector | all
    # MLC extensions (mlc_train.py:447-457)
    num_labels: int = 8
    extractor_proj_dim: int = 128
    mlc_proj: str = "v4"
    mlc_proj_dim: int = 512
    num_heads: int = 1
    sa_dim_ff: int = 128
    sa_dropout: float = 0.1
    l2_norm: bool = False
    init_prototype: bool = False
    finetune_backbone: bool = False
    num_classes: Tuple[int, ...] = tuple(NUM_CLASSES)
    # route NT-Xent through the fused Pallas TPU kernel
    use_pallas_ntxent: bool = False
    # route the photometric augmentation chain through the fused Pallas
    # kernel (sm3x.ops.augment_pallas) — single HBM round-trip per image
    use_pallas_augment: bool = False
    # NT-Xent negatives semantics (SURVEY §2c): the reference keeps
    # negatives local to each device's sub-batch. "local" reproduces that
    # by splitting the global batch into `world_size` groups; "global"
    # contrasts over the full batch (stronger but different loss scale).
    negatives: str = "local"
    # weight of the multi-crop local-view NT-Xent terms (each local view
    # contrasts against global view 1 of its modality); only consumed
    # with --data-name SevenPCSwavDataset
    local_loss_weight: float = 1.0
    # periodic BN-statistic refresh (OFF-RECIPE; 1 = reference semantics).
    # With K>1 only every K-th SSL step runs train-mode BN (batch stats +
    # EMA update); the other K-1 steps normalize with the running
    # statistics (eval-BN forward: the stat pass — +41% of forward,
    # BENCH.md — disappears and the backward loses the batch-correlation
    # reduction terms). This is the one structural escape from the
    # stat-pass tax identified by the round-2 BN experiments; it changes
    # normalization semantics (stats lag up to K-1 steps), so it is a
    # throughput knob users opt into, never a default.
    bn_stat_freq: int = 1
    # metadata vocab sizes for --arch-version trimodal (derived from the
    # dataset's metadata fields by the CLI; this default matches Derm7pt's
    # elevation/sex/location cardinality upper bounds)
    meta_vocab_sizes: Tuple[int, ...] = (4, 4, 16)


@dataclasses.dataclass
class OptimConfig:
    epochs: int = 100
    batch_size: int = 64               # GLOBAL batch (misc.py:400 divides per-device)
    base_lr: float = 1e-3
    final_lr: float = 0.0
    momentum: float = 0.9
    wd: float = 5e-2
    warmup_epochs: int = 10
    start_warmup: float = 0.0
    # opt-in warmup+cosine lr schedule for SSL pretraining; the reference
    # defines warmup/final-lr flags but never consumes them (constant lr),
    # so constant stays the default for parity
    use_lr_schedule: bool = False
    ft_lr: float = 1e-3                # backbone_train.py:615
    adam_eps: float = 1e-5             # backbone_train.py:526 (AdamW eps)
    label_weights: Tuple[float, ...] = (1.0,) * 8
    amp: bool = True                   # bf16 compute on TPU


@dataclasses.dataclass
class RunConfig:
    seed: int = 3407
    workers: int = 8
    save_freq: int = 50
    ckpt_freq: int = 1  # rolling checkpoint.msgpack cadence (epochs)
    # "msgpack" (single-file, default) or "orbax" (async CheckpointManager
    # with keep-last-k retention, multi-host-safe) for the rolling state
    ckpt_backend: str = "msgpack"
    ckpt_keep: int = 3  # orbax max_to_keep
    print_freq: int = 50
    nan_guard: bool = False  # fail fast + state dump on non-finite epoch loss
    # graceful preemption: on SIGTERM/SIGINT, checkpoint at the next epoch
    # boundary and exit 0 (TPU maintenance events give a grace window; the
    # reference's mp.spawn workers just die and lose the epoch)
    save_on_preempt: bool = False
    resume_path: Optional[str] = None
    pretrain_path: Optional[str] = None
    log_path: str = "./logs"
    logger_name: Optional[str] = None
    tensorboard: bool = False
    wandb: bool = False
    proj_name: str = "sm3x"
    run_group: Optional[str] = None
    run_name: Optional[str] = None
    run_type: str = "train"
    comments: str = "sm3x training"
    # mesh shape; data=None means "all devices / model"
    mesh_data: Optional[int] = None
    mesh_model: int = 1
    # logical world size for local-negative grouping; None = mesh data size
    world_size: Optional[int] = None


@dataclasses.dataclass
class SSLConfig:
    """Stage-1 SSL pretraining (tools/backbone_train.py + run.sh:3-12)."""
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    optim: OptimConfig = dataclasses.field(
        default_factory=lambda: OptimConfig(epochs=400, batch_size=96, base_lr=1e-6)
    )
    run: RunConfig = dataclasses.field(default_factory=RunConfig)
    n_views: int = 2
    modality_weights: Tuple[float, float] = (1.0, 1.0)


@dataclasses.dataclass
class MLCTrainConfig:
    """Stage-2 DeepCluster MLC training (tools/mlc_train.py + run.sh:32-43)."""
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(
        default_factory=lambda: ModelConfig(temperature=1.0)
    )
    optim: OptimConfig = dataclasses.field(
        default_factory=lambda: OptimConfig(epochs=150, batch_size=256, base_lr=1e-4)
    )
    run: RunConfig = dataclasses.field(default_factory=RunConfig)
    extractor_weights: Optional[str] = None
    kmeans_iters: int = 10             # mlc_train.py:123


@dataclasses.dataclass
class EvalConfig:
    """Supervised eval/finetune (tools/mlc_eval.py, tools/backbone_eval.py)."""
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    optim: OptimConfig = dataclasses.field(
        default_factory=lambda: OptimConfig(epochs=100, batch_size=128, base_lr=1e-3)
    )
    run: RunConfig = dataclasses.field(default_factory=RunConfig)
    train_sz: int = 224
    test_sz: int = 224


def asdict_flat(cfg) -> dict:
    """Flatten a nested config into {'optim.base_lr': ...} for configs.txt."""
    out = {}

    def rec(prefix, obj):
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            key = f"{prefix}{f.name}"
            if dataclasses.is_dataclass(v):
                rec(key + ".", v)
            else:
                out[key] = v

    rec("", cfg)
    return out
