"""CLI applications (the reference's tools/*.py surfaces, SURVEY §2a
P19-P22). Each is exposed both as a console script (pyproject
`[project.scripts]`) and through the `tools/*.py` shims that mirror the
reference repo layout.

Every app follows the reference's error convention: tracebacks are
appended to `<log_path>/error.log` (tools/backbone_train.py:630-640)."""

from __future__ import annotations

import os
import traceback

from sm3x.cli.parser import get_parser, ssl_config, mlc_train_config, eval_config
from sm3x.core.config import asdict_flat
from sm3x.data.datasets import build_dataset
from sm3x.utils import increment_path, save_args, setup_logger, fix_random_seeds


def _apply_platform_env():
    """SM3X_PLATFORM=cpu|tpu forces the jax backend in-process. On this
    class of host a sitecustomize pins the TPU platform before user code
    runs, so JAX_PLATFORMS in a subprocess environment is consumed too
    late — an in-process `jax.config.update` before first device use is
    the only channel that sticks. cpu implies a virtual multi-device
    host platform (SM3X_CPU_DEVICES, default 8 — the same mesh the test
    suite uses)."""
    plat = os.environ.get("SM3X_PLATFORM")
    if plat:
        if plat == "cpu":
            # XLA:CPU's collective rendezvous aborts the process when the
            # virtual device threads starve past the terminate timeout
            # (~40s default) — raise it; only the env var channel exists,
            # and it is read at backend init (i.e. still in time here).
            flags = os.environ.get("XLA_FLAGS", "")
            if "collective_call_terminate" not in flags:
                os.environ["XLA_FLAGS"] = (flags + (
                    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=60"
                    " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
                )).strip()
        import jax

        jax.config.update("jax_platforms", plat)
        if plat == "cpu":
            jax.config.update(
                "jax_num_cpu_devices",
                int(os.environ.get("SM3X_CPU_DEVICES", "8")))


def _maybe_distributed(args):
    """--coordinator host:port (+ --num-processes/--process-id) brings up
    jax.distributed before any mesh/backend use — the CLI surface of the
    reference's init_process_group + mp.spawn launcher
    (misc.py:390-415, backbone_train.py:626-631). All ranks share ONE run
    dir (resolved by rank 0 in _setup and broadcast); non-zero ranks
    write per-rank `log.txt.rank{N}` files (reference logger.py:44-63)."""
    if not getattr(args, "coordinator", None):
        return
    from sm3x.parallel import distributed_initialize

    distributed_initialize(args.coordinator, args.num_processes,
                           args.process_id)


def _capture_errors(log_path: str, fn):
    try:
        return fn()
    except Exception as e:
        print(e, "\n")
        with open(os.path.join(log_path, "error.log"), "a") as f:
            traceback.print_exc(file=f)
            f.write("\n")
        raise


def _setup(args, cfg, logger_name: str):
    from sm3x.parallel import broadcast_string, process_info

    rank, world = process_info()
    if rank == 0:
        args.log_path = str(increment_path(args.log_path, sep="_", mkdir=True))
    if world > 1:
        # rank 0 resolved the run dir; every rank adopts it (independent
        # increment_path resolution would race on a shared filesystem)
        args.log_path = broadcast_string(args.log_path)
        os.makedirs(args.log_path, exist_ok=True)
    cfg.run.log_path = args.log_path
    if rank == 0:
        save_args(asdict_flat(cfg), os.path.join(args.log_path, "configs.txt"))
    logger = setup_logger(args.log_path, logger_name, distributed_rank=rank)
    fix_random_seeds(cfg.run.seed)
    return logger


# ---------------------------------------------------------------------------
# Stage-1 SSL pretraining (reference tools/backbone_train.py)
# ---------------------------------------------------------------------------

def backbone_train_main():
    _apply_platform_env()
    parser = get_parser("sm3x SimCLR skin SSL training")
    parser.add_argument("--arch-version", type=str, default="v3")
    parser.add_argument("--arch-weights", type=str, default=None)
    parser.add_argument("--ft-lr", default=1e-3, type=float)
    parser.add_argument("--proj-dim", type=int, default=128)
    parser.add_argument("--temperature", type=float, default=0.5)
    parser.add_argument("--modality-weights", nargs=2, type=float, default=[1.0, 1.0])
    parser.add_argument("--num-labels", type=int, default=8)
    parser.add_argument("--label-weights", nargs="*", type=float,
                        default=[1.0] * 8)
    parser.add_argument("--use-checkpoint", nargs="?", const=True,
                        default=False,
                        help="activation-memory strategy: bare flag = full "
                        "per-block remat; '=dots' = selective policy remat; "
                        "'=attn' = recompute only the attention internals in "
                        "the backward; '=mlp' = recompute the fc1+gelu span; "
                        "'=attn_mlp' = both; '=flash' = fused Pallas flash-"
                        "attention (TPU; attn/mlp/attn_mlp/flash are ViT "
                        "backbones only); "
                        "'=off' = XLA save-all residuals. ViT SSL defaults "
                        "to 'attn' (measured faster at every batch size, "
                        "identical numerics — BENCH.md round 4)")
    parser.add_argument("--use-pallas-ntxent", action="store_true",
                        help="fused Pallas NT-Xent kernel in the SSL loss")
    parser.add_argument("--negatives", choices=("local", "global"),
                        default="local",
                        help="NT-Xent negative pool (SURVEY §2c): 'local' "
                        "contrasts within each of --world-size per-device "
                        "groups (reference semantics, simclr.py:54-93); "
                        "'global' uses the full global batch as negatives")
    parser.add_argument("--bn-stat-freq", type=int, default=1,
                        help="EXPERIMENTAL throughput knob (+11%% at K=4): "
                        "refresh BN batch statistics only every K-th step; "
                        "the other steps normalize with running stats "
                        "(eval-BN forward, no stat pass). Measured HARMFUL "
                        "to learned-feature quality in a learning-regime "
                        "grid at lr 1e-5 (K=4 probe lands below the "
                        "random-init control — BENCH.md round 4); keep at "
                        "1 (reference semantics) for quality-critical runs")
    parser.add_argument("--linear-probe", action="store_true",
                        help="run the in-tool linear probe after training "
                        "(backbone_train.py:293-426; disabled at :607 in "
                        "the reference)")
    args = parser.parse_args()
    _maybe_distributed(args)
    cfg = ssl_config(args)
    logger = _setup(args, cfg, "sm3x.ssl")

    def run():
        from sm3x.train.backbone_train import SSLTrainer

        data = build_dataset(cfg.data.data_name, cfg.data.data_path, "train",
                             cache_size=cfg.data.cache_size,
                             workers=cfg.run.workers,
                             streaming=not cfg.data.cache_images)
        logger.info(f"Building train data done with {data.n} images loaded.")
        run_cfg = cfg
        if args.arch_version == "trimodal":
            # size the metadata embeddings from THIS dataset's vocabularies
            sizes = getattr(data, "meta_vocab_sizes", None)
            if sizes:
                import dataclasses as _dc

                run_cfg = _dc.replace(cfg, model=_dc.replace(
                    cfg.model, meta_vocab_sizes=tuple(sizes)))
                logger.info(f"trimodal metadata vocab sizes: {tuple(sizes)}")
        trainer = SSLTrainer(run_cfg, logger=logger)
        trainer.resume()  # --resume-path: orbax dir or msgpack file
        trainer.fit(data)

        if args.linear_probe:
            from sm3x.models.backbones import feat_dim
            from sm3x.train.linear_probe import LinearProbe, make_ssl_extract_fn

            test = build_dataset(cfg.data.data_name, cfg.data.data_path,
                                 "test", cache_size=cfg.data.cache_size,
                                 workers=cfg.run.workers,
                                 streaming=not cfg.data.cache_images)
            extract = make_ssl_extract_fn(
                trainer.model, trainer.state, trainer.mesh,
                tuple(cfg.data.mean), tuple(cfg.data.std),
                tuple(cfg.data.img_sz))
            probe = LinearProbe(2 * feat_dim(cfg.model.arch),
                                ft_lr=args.ft_lr, wd=cfg.optim.wd,
                                seed=cfg.run.seed, mesh=trainer.mesh)
            best = probe.run(extract, data, test, cfg.optim.batch_size,
                             epochs=50, label_weights=cfg.optim.label_weights,
                             seed=cfg.run.seed, logger=logger)
            logger.info(f"linear probe best val AUC_AVG: {best['AUC_AVG']:.4f}")

    return _capture_errors(args.log_path, run)


# ---------------------------------------------------------------------------
# Stage-2 DeepCluster MLC training (reference tools/mlc_train.py)
# ---------------------------------------------------------------------------

def load_extractor_tree(path: str, arch: str):
    """Stage-1 weights from either an sm3x msgpack or a torch .pth."""
    if path.endswith(".pth") or path.endswith(".pth.tar"):
        from sm3x.utils.checkpoint import load_torch_ssl_checkpoint

        return load_torch_ssl_checkpoint(path, arch, with_projectors=False)
    from sm3x.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(path)
    return ckpt["params"], ckpt["batch_stats"]


def mlc_train_main():
    _apply_platform_env()
    parser = get_parser("sm3x DeepCluster MLC training")
    parser.add_argument("--num-labels", type=int, default=8)
    parser.add_argument("--extractor-proj-dim", type=int, default=128)
    parser.add_argument("--extractor-weights", type=str, default=None)
    parser.add_argument("--mlc-proj", type=str, default="v4")
    parser.add_argument("--mlc-proj-dim", type=int, default=256)
    parser.add_argument("--num-heads", type=int, default=1)
    parser.add_argument("--sa-dim-ff", type=int, default=256)
    parser.add_argument("--sa-dropout", type=float, default=0.1)
    parser.add_argument("--temperature", type=float, default=0.1)
    parser.add_argument("--l2-norm", action="store_true")
    parser.add_argument("--finetune-backbone", action="store_true")
    args = parser.parse_args()
    _maybe_distributed(args)
    cfg = mlc_train_config(args)
    logger = _setup(args, cfg, "sm3x.mlc")

    def run():
        from sm3x.train.mlc_train import MLCTrainer

        data = build_dataset(cfg.data.data_name, cfg.data.data_path, "train",
                             cache_size=cfg.data.cache_size,
                             workers=cfg.run.workers,
                             streaming=not cfg.data.cache_images)
        logger.info(f"Building train data done with {data.n} images loaded.")
        extractor_tree = None
        if cfg.extractor_weights:
            extractor_tree = load_extractor_tree(cfg.extractor_weights,
                                                 cfg.model.arch)
        trainer = MLCTrainer(cfg, logger=logger, extractor_tree=extractor_tree)
        trainer.resume()  # --resume-path: orbax dir or msgpack file
        trainer.fit(data)

    return _capture_errors(args.log_path, run)


# ---------------------------------------------------------------------------
# Supervised MLC finetune/eval (reference tools/mlc_eval.py)
# ---------------------------------------------------------------------------

def load_pretrained_tree(path: str, arch: str, variant: str):
    if path.endswith(".pth") or path.endswith(".pth.tar"):
        from sm3x.utils.checkpoint import load_torch_mlc_checkpoint

        return load_torch_mlc_checkpoint(path, arch, variant=variant)
    from sm3x.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(path)
    return ckpt["params"], ckpt["batch_stats"]


def mlc_eval_main():
    _apply_platform_env()
    parser = get_parser("sm3x MLC supervised finetune/eval")
    parser.add_argument("--mlc-proj", type=str, default="v4")
    parser.add_argument("--mlc-proj-dim", type=int, default=256)
    parser.add_argument("--num-heads", type=int, default=1)
    parser.add_argument("--sa-dim-ff", type=int, default=256)
    parser.add_argument("--sa-dropout", type=float, default=0.1)
    parser.add_argument("--arch-weights", type=str, default=None)
    parser.add_argument("--extractor-proj-dim", type=int, default=128)
    parser.add_argument("--num-labels", type=int, default=8)
    parser.add_argument("--label-weights", nargs="*", type=float, default=[1.0] * 8)
    parser.add_argument("--l2-norm", action="store_true")
    parser.add_argument("--init-prototype", action="store_true")
    parser.add_argument("--train-sz", type=int, default=224)
    parser.add_argument("--test-sz", type=int, default=224)
    args = parser.parse_args()
    _maybe_distributed(args)
    cfg = eval_config(args)
    logger = _setup(args, cfg, "sm3x.mlc_eval")

    def run():
        from sm3x.train.mlc_eval import MLCEvalTrainer

        train = build_dataset(cfg.data.data_name, cfg.data.data_path, "train",
                              cache_size=cfg.data.cache_size,
                              workers=cfg.run.workers,
                              streaming=not cfg.data.cache_images)
        test = build_dataset(cfg.data.data_name, cfg.data.data_path, "test",
                             cache_size=cfg.data.cache_size,
                             workers=cfg.run.workers,
                             streaming=not cfg.data.cache_images)
        logger.info(f"train {train.n} / test {test.n} images loaded.")
        tree = None
        if cfg.run.pretrain_path and os.path.isfile(cfg.run.pretrain_path):
            logger.info(f"Loading pre-trained weights from "
                        f"'{cfg.run.pretrain_path}' ...")
            tree = load_pretrained_tree(cfg.run.pretrain_path, cfg.model.arch,
                                        cfg.model.mlc_proj)
        trainer = MLCEvalTrainer(cfg, logger=logger, pretrained_tree=tree)
        trainer.resume()  # --resume-path: orbax dir or msgpack file
        best = trainer.fit(train, test)
        logger.info(f"Best val AUC_AVG: {best:.4f}")
        out_csv = os.path.join(args.log_path, "results.csv")
        trainer.write_results(test, out_csv)
        logger.info(f"Wrote {out_csv}")

    return _capture_errors(args.log_path, run)


# ---------------------------------------------------------------------------
# Backbone linear eval (reference tools/backbone_eval.py)
# ---------------------------------------------------------------------------

# backbone_eval loads the same stage-1 artifacts as mlc_train
load_encoder_tree = load_extractor_tree


def backbone_eval_main():
    _apply_platform_env()
    parser = get_parser("sm3x backbone linear eval")
    parser.add_argument("--num-labels", type=int, default=8)
    parser.add_argument("--label-weights", nargs="*", type=float, default=[1.0] * 8)
    args = parser.parse_args()
    _maybe_distributed(args)
    cfg = eval_config(args)
    logger = _setup(args, cfg, "sm3x.backbone_eval")

    def run():
        from sm3x.train.backbone_eval import BackboneEvalTrainer

        train = build_dataset(cfg.data.data_name, cfg.data.data_path, "train",
                              cache_size=cfg.data.cache_size,
                              workers=cfg.run.workers,
                              streaming=not cfg.data.cache_images)
        test = build_dataset(cfg.data.data_name, cfg.data.data_path, "test",
                             cache_size=cfg.data.cache_size,
                             workers=cfg.run.workers,
                             streaming=not cfg.data.cache_images)
        logger.info(f"train {train.n} / test {test.n} images loaded.")
        tree = None
        if cfg.run.pretrain_path and os.path.isfile(cfg.run.pretrain_path):
            tree = load_encoder_tree(cfg.run.pretrain_path, cfg.model.arch)
        trainer = BackboneEvalTrainer(cfg, logger=logger, encoder_tree=tree)
        trainer.resume()  # --resume-path: orbax dir or msgpack file
        best = trainer.fit(train, test)
        logger.info(f"Best val AUC_AVG: {best:.4f}")
        out_csv = os.path.join(args.log_path, "results.csv")
        trainer.write_results(test, out_csv)
        logger.info(f"Wrote {out_csv}")

    return _capture_errors(args.log_path, run)
