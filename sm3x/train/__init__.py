from sm3x.train.common import (
    TrainState,
    make_adamw,
    path_mask,
    create_train_state,
)
from sm3x.train.backbone_train import SSLTrainer, make_ssl_train_step
from sm3x.train.mlc_train import MLCTrainer, make_mlc_train_step, cluster_and_update
from sm3x.train.mlc_eval import MLCEvalTrainer
from sm3x.train.backbone_eval import BackboneEvalTrainer
from sm3x.train.linear_probe import LinearProbe, make_ssl_extract_fn
from sm3x.train.supervised import (
    make_supervised_steps,
    run_train_epoch,
    run_eval_epoch,
    collect_eval_logits,
)

__all__ = [
    "TrainState",
    "make_adamw",
    "path_mask",
    "create_train_state",
    "SSLTrainer",
    "make_ssl_train_step",
    "MLCTrainer",
    "make_mlc_train_step",
    "cluster_and_update",
    "MLCEvalTrainer",
    "BackboneEvalTrainer",
    "LinearProbe",
    "make_ssl_extract_fn",
    "make_supervised_steps",
    "run_train_epoch",
    "run_eval_epoch",
    "collect_eval_logits",
]
