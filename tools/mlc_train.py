#!/usr/bin/env python
"""Stage-2 DeepCluster MLC training CLI (reference tools/mlc_train.py
surface). Loads the stage-1 checkpoint (msgpack or .pth) into the frozen
dual extractor and trains the per-label prototype heads on k-means
cluster assignments."""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sm3x.cli.parser import get_parser, mlc_train_config
from sm3x.core.config import asdict_flat
from sm3x.data.datasets import build_dataset
from sm3x.utils import increment_path, save_args, setup_logger, fix_random_seeds


def load_extractor_tree(path: str, arch: str):
    """Stage-1 weights from either an sm3x msgpack or a torch .pth."""
    if path.endswith(".pth") or path.endswith(".pth.tar"):
        from sm3x.utils.checkpoint import load_torch_ssl_checkpoint

        return load_torch_ssl_checkpoint(path, arch, with_projectors=False)
    from sm3x.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(path)
    return ckpt["params"], ckpt["batch_stats"]


def main():
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

    args.log_path = str(increment_path(args.log_path, sep="_", mkdir=True))
    cfg = mlc_train_config(args)
    cfg.run.log_path = args.log_path
    save_args(asdict_flat(cfg), os.path.join(args.log_path, "configs.txt"))
    logger = setup_logger(args.log_path, "sm3x.mlc")
    fix_random_seeds(cfg.run.seed)

    try:
        from sm3x.train.mlc_train import MLCTrainer

        data = build_dataset(cfg.data.data_name, cfg.data.data_path, "train",
                             cache_size=cfg.data.cache_size,
                             workers=cfg.run.workers)
        logger.info(f"Building train data done with {data.n} images loaded.")
        extractor_tree = None
        if cfg.extractor_weights:
            extractor_tree = load_extractor_tree(cfg.extractor_weights,
                                                 cfg.model.arch)
        trainer = MLCTrainer(cfg, logger=logger, extractor_tree=extractor_tree)
        trainer.fit(data)
    except Exception as e:
        print(e, "\n")
        with open(os.path.join(args.log_path, "error.log"), "a") as f:
            traceback.print_exc(file=f)
            f.write("\n")
        raise


if __name__ == "__main__":
    main()
