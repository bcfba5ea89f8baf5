"""Logger with elapsed-time prefix + optional wandb/tensorboard.

Parity target: the detectron2-style logger of src/utils/logger.py:12-75
(elapsed [d hh:mm:ss] prefix, stdout + per-run file) and the optional
wandb/tensorboard hooks of src/utils/misc.py:244-280,346-385. TB/wandb
are lazily imported and fully optional (SURVEY §5 observability)."""

from __future__ import annotations

import functools
import logging
import os
import sys
import time
from typing import Optional


class _ElapsedFormatter(logging.Formatter):
    """'[0d 00:01:23] module INFO: msg' style prefix."""

    def __init__(self):
        super().__init__()
        self.start = time.time()

    def format(self, record):
        elapsed = int(time.time() - self.start)
        d, rem = divmod(elapsed, 86400)
        h, rem = divmod(rem, 3600)
        m, s = divmod(rem, 60)
        prefix = f"[{d}d {h:02d}:{m:02d}:{s:02d}]"
        return f"{prefix} {record.name} {record.levelname}: {record.getMessage()}"


def setup_logger(output: Optional[str] = None, name: str = "sm3x",
                 to_stdout: bool = True,
                 distributed_rank: Optional[int] = None) -> logging.Logger:
    """Rank-aware logger (reference logger.py:44-63 semantics): stdout on
    rank 0 only; every rank writes a file, non-zero ranks with a
    `.rank{N}` suffix so same-dir multi-process runs never interleave.
    `distributed_rank=None` auto-detects from the jax.distributed runtime
    state (0 when not distributed) — normalized BEFORE the handler cache
    so auto and explicit calls share one entry."""
    if distributed_rank is None:
        from sm3x.parallel.collectives import process_info

        distributed_rank = process_info()[0]
    return _setup_logger_cached(output, name, to_stdout, distributed_rank)


@functools.lru_cache(maxsize=None)
def _setup_logger_cached(output: Optional[str], name: str, to_stdout: bool,
                         distributed_rank: int) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    fmt = _ElapsedFormatter()
    if to_stdout and distributed_rank == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(fmt)
        logger.addHandler(ch)
    if output:
        os.makedirs(output, exist_ok=True)
        filename = "log.txt"
        if distributed_rank > 0:
            filename += f".rank{distributed_rank}"
        fh = logging.FileHandler(os.path.join(output, filename))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


_LOG_COUNTS: dict = {}
_LOG_TIMES: dict = {}


def log_first_n(logger, msg: str, n: int = 1, key: Optional[str] = None):
    key = key or msg
    _LOG_COUNTS[key] = _LOG_COUNTS.get(key, 0) + 1
    if _LOG_COUNTS[key] <= n:
        logger.info(msg)


def log_every_n(logger, msg: str, n: int = 1, key: Optional[str] = None):
    key = key or msg
    _LOG_COUNTS[key] = _LOG_COUNTS.get(key, 0) + 1
    if (_LOG_COUNTS[key] - 1) % n == 0:
        logger.info(msg)


def log_every_n_seconds(logger, msg: str, n: int = 1, key: Optional[str] = None):
    key = key or msg
    now = time.time()
    last = _LOG_TIMES.get(key)
    if last is None or now - last >= n:
        _LOG_TIMES[key] = now
        logger.info(msg)


class StatWriter:
    """Optional TB/wandb sink; silently no-ops if the libs are absent."""

    def __init__(self, log_path: str, tensorboard: bool = False,
                 wandb: bool = False, project: str = "sm3x", config=None):
        self.log_path = log_path
        self.tb = None
        self.wb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(log_path, "tb_log"))
            except Exception:
                pass
        if wandb:
            try:
                import wandb as wb

                wb.init(project=project, dir=log_path, config=config)
                self.wb = wb
            except Exception:
                pass

    def define_summaries(self, summaries: dict):
        """wandb define_metric summaries ({metric: "min"|"max"}, the
        reference's define_wandb_summary, misc.py:238-241)."""
        if self.wb:
            for k, v in summaries.items():
                try:
                    self.wb.define_metric(k, summary=v)
                except Exception:
                    pass

    def log(self, stats: dict, step: int, prefix: str = ""):
        items = {f"{prefix}{k}": v for k, v in stats.items()}
        if self.tb:
            for k, v in items.items():
                self.tb.add_scalar(k, v, step)
        if self.wb:
            self.wb.log(items, step=step)

    def close(self):
        if self.tb:
            self.tb.flush()
            self.tb.close()
        if self.wb:
            # upload the run's text logs before finishing (the reference's
            # close_wandb log-file upload, misc.py:368-385)
            for name in ("outputs.log", "log.txt", "configs.txt"):
                path = os.path.join(self.log_path, name)
                if os.path.isfile(path):
                    try:
                        self.wb.save(path, base_path=self.log_path)
                    except Exception:
                        pass
            self.wb.finish()


def generate_stat_text(train_stat, val_stat, summary_stat,
                       metrics_name, classes_name) -> str:
    """Epoch summary table (misc.py:330-343)."""
    text = ""
    for m in metrics_name:
        text += "------\n"
        for c in list(classes_name) + ["AVG"]:
            name = f"{m}_{c}"
            text += "{}: {:.4f}/{:.4f} | ".format(
                name, train_stat[name], summary_stat[f"train/{name}"].val())
            text += "{:.4f}/{:.4f}\n".format(
                val_stat[name], summary_stat[f"val/{name}"].val())
    return text
