"""Run-dir, seeding and meter utilities (reference src/utils/misc.py
counterparts: increment_path :45-59, save_args :62-65, fix_random_seeds
:228-235, AverageMeter/ProgressMeter/BestRecorder :540-608)."""

from __future__ import annotations

import glob
import random
import re
import sys
from pathlib import Path

import numpy as np


def increment_path(path, exist_ok: bool = False, sep: str = "_", mkdir: bool = True):
    """runs/exp -> runs/exp, runs/exp_2, runs/exp_3, ..."""
    path = Path(path)
    if path.exists() and not exist_ok:
        suffix = path.suffix
        stem_path = path.with_suffix("")
        candidates = glob.glob(f"{stem_path}{sep}*")
        nums = []
        for c in candidates:
            m = re.search(rf"{re.escape(stem_path.stem)}{sep}(\d+)", c)
            if m:
                nums.append(int(m.group(1)))
        n = max(nums) + 1 if nums else 2
        path = Path(f"{stem_path}{sep}{n}{suffix}")
    directory = path if path.suffix == "" else path.parent
    if mkdir and not directory.exists():
        directory.mkdir(parents=True, exist_ok=True)
    return path


def save_args(args_dict: dict, path: str):
    """Dump config key: value lines, sorted (configs.txt convention)."""
    with open(path, "w") as f:
        for k in sorted(args_dict):
            f.write(f"{k}: {args_dict[k]}\n")


def fix_random_seeds(seed: int = 3407):
    random.seed(seed)
    np.random.seed(seed)


class AverageMeter:
    """Running average of a scalar."""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)


class ProgressMeter:
    def __init__(self, num_batches: int, meters, prefix: str = ""):
        self.batch_fmtstr = self._fmt(num_batches)
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int) -> str:
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        return "\t".join(entries)

    @staticmethod
    def _fmt(num_batches: int) -> str:
        digits = len(str(num_batches))
        fmt = "{:" + str(digits) + "d}"
        return "[" + fmt + "/" + fmt.format(num_batches) + "]"


class BestRecorder:
    def __init__(self, mode: str, best=None):
        assert mode in ("min", "max"), "invalid mode!"
        self.mode = mode
        if best is None:
            self.best = sys.maxsize if mode == "min" else -sys.maxsize
        else:
            self.best = best

    def update(self, val):
        improved = val < self.best if self.mode == "min" else val > self.best
        self.best = min(val, self.best) if self.mode == "min" else max(val, self.best)
        return (self.best, improved)

    def val(self):
        return self.best


def create_eval_stat(prefix: str, metrics_name, classes_name, mode: str):
    """{"<prefix>/<metric>_<class>": mode} (misc.py:283-288)."""
    out = {}
    for m in metrics_name:
        for c in list(classes_name) + ["AVG"]:
            out[f"{prefix}/{m}_{c}"] = mode
    return out
