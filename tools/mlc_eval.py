#!/usr/bin/env python
"""Supervised finetune/eval of the MLC model (reference tools/mlc_eval.py
surface) — produces best_eval + a results CSV in the released layout."""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sm3x.cli.parser import get_parser, eval_config
from sm3x.core.config import asdict_flat
from sm3x.data.datasets import build_dataset
from sm3x.utils import increment_path, save_args, setup_logger, fix_random_seeds


def load_pretrained_tree(path: str, arch: str, variant: str):
    if path.endswith(".pth") or path.endswith(".pth.tar"):
        from sm3x.utils.checkpoint import load_torch_mlc_checkpoint

        return load_torch_mlc_checkpoint(path, arch, variant=variant)
    from sm3x.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(path)
    return ckpt["params"], ckpt["batch_stats"]


def main():
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

    args.log_path = str(increment_path(args.log_path, sep="_", mkdir=True))
    cfg = eval_config(args)
    cfg.run.log_path = args.log_path
    save_args(asdict_flat(cfg), os.path.join(args.log_path, "configs.txt"))
    logger = setup_logger(args.log_path, "sm3x.mlc_eval")
    fix_random_seeds(cfg.run.seed)

    try:
        from sm3x.train.mlc_eval import MLCEvalTrainer

        train = build_dataset(cfg.data.data_name, cfg.data.data_path, "train",
                              cache_size=cfg.data.cache_size,
                              workers=cfg.run.workers)
        test = build_dataset(cfg.data.data_name, cfg.data.data_path, "test",
                             cache_size=cfg.data.cache_size,
                             workers=cfg.run.workers)
        logger.info(f"train {train.n} / test {test.n} images loaded.")
        tree = None
        if cfg.run.pretrain_path and os.path.isfile(cfg.run.pretrain_path):
            logger.info(f"Loading pre-trained weights from "
                        f"'{cfg.run.pretrain_path}' ...")
            tree = load_pretrained_tree(cfg.run.pretrain_path, cfg.model.arch,
                                        cfg.model.mlc_proj)
        trainer = MLCEvalTrainer(cfg, logger=logger, pretrained_tree=tree)
        best = trainer.fit(train, test)
        logger.info(f"Best val AUC_AVG: {best:.4f}")
        out_csv = os.path.join(args.log_path, "results.csv")
        trainer.write_results(test, out_csv)
        logger.info(f"Wrote {out_csv}")
    except Exception as e:
        print(e, "\n")
        with open(os.path.join(args.log_path, "error.log"), "a") as f:
            traceback.print_exc(file=f)
            f.write("\n")
        raise


if __name__ == "__main__":
    main()
