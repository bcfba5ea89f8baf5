from sm3x.utils.misc import (
    increment_path,
    save_args,
    fix_random_seeds,
    AverageMeter,
    ProgressMeter,
    BestRecorder,
    create_eval_stat,
)
from sm3x.utils.logging import setup_logger, StatWriter, generate_stat_text
from sm3x.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    restart_from_checkpoint,
    export_backbone,
)

__all__ = [
    "increment_path",
    "save_args",
    "fix_random_seeds",
    "AverageMeter",
    "ProgressMeter",
    "BestRecorder",
    "create_eval_stat",
    "setup_logger",
    "StatWriter",
    "generate_stat_text",
    "save_checkpoint",
    "load_checkpoint",
    "restart_from_checkpoint",
    "export_backbone",
]
