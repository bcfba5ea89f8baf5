#!/usr/bin/env python
"""Stage-1 SSL pretraining CLI (reference tools/backbone_train.py surface).

    python tools/backbone_train.py -a resnet50 --arch-version v32 \
        --data-name SevenPCBaseDataset --data-path ./data/7PC \
        --mean 0.7833 0.6712 0.6026 --std 0.2139 0.2472 0.2571 \
        --epochs 400 -b 96 -lr 1e-6 --proj-dim 128 --temperature 0.1 --amp
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sm3x.cli.parser import get_parser, ssl_config
from sm3x.core.config import asdict_flat
from sm3x.data.datasets import build_dataset
from sm3x.utils import increment_path, save_args, setup_logger, fix_random_seeds


def main():
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
    parser.add_argument("--use-checkpoint", action="store_true")
    parser.add_argument("--use-pallas-ntxent", action="store_true",
                        help="fused Pallas NT-Xent kernel in the SSL loss")
    parser.add_argument("--linear-probe", action="store_true",
                        help="run the in-tool linear probe after training "
                        "(backbone_train.py:293-426; disabled at :607 in "
                        "the reference)")
    args = parser.parse_args()

    args.log_path = str(increment_path(args.log_path, sep="_", mkdir=True))
    cfg = ssl_config(args)
    cfg.run.log_path = args.log_path
    save_args(asdict_flat(cfg), os.path.join(args.log_path, "configs.txt"))
    logger = setup_logger(args.log_path, "sm3x.ssl")
    fix_random_seeds(cfg.run.seed)

    try:
        from sm3x.train.backbone_train import SSLTrainer

        data = build_dataset(cfg.data.data_name, cfg.data.data_path, "train",
                             cache_size=cfg.data.cache_size,
                             workers=cfg.run.workers)
        logger.info(f"Building train data done with {data.n} images loaded.")
        trainer = SSLTrainer(cfg, logger=logger)
        if cfg.run.resume_path and os.path.isdir(cfg.run.resume_path):
            # an orbax_ckpt directory from a previous run
            if not trainer.resume_from_orbax(cfg.run.resume_path):
                logger.warning(
                    f"no orbax steps in '{cfg.run.resume_path}'")
                sys.exit(1)
        elif cfg.run.resume_path:
            from sm3x.utils import restart_from_checkpoint
            from sm3x.utils.checkpoint import restore_into

            ckpt = restart_from_checkpoint(cfg.run.resume_path, logger)
            if ckpt is None:
                sys.exit(1)
            opt_state = trainer.state.opt_state
            if "opt_state" in ckpt:
                opt_state = restore_into(opt_state, ckpt["opt_state"])
            trainer.state = trainer.state.replace(
                params=restore_into(trainer.state.params, ckpt["params"]),
                batch_stats=restore_into(trainer.state.batch_stats,
                                         ckpt["batch_stats"]),
                opt_state=opt_state)
            trainer.start_epoch = int(ckpt.get("epoch", 0))
        trainer.fit(data)

        if args.linear_probe:
            from sm3x.models.backbones import feat_dim
            from sm3x.train.linear_probe import LinearProbe, make_ssl_extract_fn

            test = build_dataset(cfg.data.data_name, cfg.data.data_path,
                                 "test", cache_size=cfg.data.cache_size,
                                 workers=cfg.run.workers)
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
    except Exception as e:
        print(e, "\n")
        with open(os.path.join(args.log_path, "error.log"), "a") as f:
            traceback.print_exc(file=f)
            f.write("\n")
        raise


if __name__ == "__main__":
    main()
