"""--save-on-preempt graceful preemption (SURVEY §5 failure detection /
recovery): a SIGTERM mid-run writes the rolling checkpoint at the next
epoch boundary and leaves the epoch loop cleanly, and a fresh trainer
resumes from it. The reference's mp.spawn workers die mid-epoch and lose
the run (tools/backbone_train.py:626-640 only logs the traceback)."""

import os
import signal

import pytest

from sm3x.core.config import (SSLConfig, DataConfig, ModelConfig,
                              OptimConfig, RunConfig)
from sm3x.data.datasets import build_dataset
from sm3x.data.synthetic import make_fake_derm7pt
from sm3x.train.backbone_train import SSLTrainer


@pytest.fixture
def tiny(tmp_path):
    root = str(tmp_path / "data")
    make_fake_derm7pt(root, n_cases=8, img_size=56)
    data = build_dataset("SevenPCBaseDataset", root, "train", cache_size=64)
    cfg = SSLConfig(
        data=DataConfig(img_sz=(32, 32)),
        model=ModelConfig(arch="resnet18", arch_version="v32", proj_dim=16,
                          temperature=0.1),
        optim=OptimConfig(epochs=6, batch_size=8, base_lr=1e-3, amp=False),
        # ckpt_freq/save_freq far beyond the run: ONLY the preemption path
        # can produce checkpoint.msgpack
        run=RunConfig(log_path=str(tmp_path), seed=0, save_freq=100,
                      ckpt_freq=100, save_on_preempt=True),
    )
    return cfg, data


def test_sigterm_checkpoints_and_breaks(tiny):
    cfg, data = tiny
    t = SSLTrainer(cfg)
    prev_term = signal.getsignal(signal.SIGTERM)
    prev_int = signal.getsignal(signal.SIGINT)

    orig_epoch = t.train_epoch

    def epoch_then_signal(d, epoch):
        stat = orig_epoch(d, epoch)
        if epoch == 1:
            # CPython delivers the handler in the main thread at the next
            # bytecode boundary — well before fit's epoch-boundary poll
            os.kill(os.getpid(), signal.SIGTERM)
        return stat

    t.train_epoch = epoch_then_signal
    try:
        t.fit(data)
    finally:
        signal.signal(signal.SIGTERM, prev_term)
        signal.signal(signal.SIGINT, prev_int)

    assert t._preempt_signal == signal.SIGTERM
    roll = os.path.join(cfg.run.log_path, "checkpoint.msgpack")
    assert os.path.isfile(roll), "preemption must force the rolling save"
    # fit() restored the pre-install dispositions (finish_checkpoints):
    # post-fit phases must not swallow SIGTERM/Ctrl-C into a dead flag
    assert not t._orig_handlers

    t2 = SSLTrainer(cfg)
    assert t2.resume(roll)
    assert t2.start_epoch == 2, "epochs 2..5 must not have run"


def test_no_handler_without_flag(tiny):
    cfg, data = tiny
    import dataclasses

    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, save_on_preempt=False),
        optim=dataclasses.replace(cfg.optim, epochs=1))
    prev_term = signal.getsignal(signal.SIGTERM)
    t = SSLTrainer(cfg)
    try:
        t.fit(data)
        assert signal.getsignal(signal.SIGTERM) is prev_term
        assert not t.preemption_break(0)
    finally:
        signal.signal(signal.SIGTERM, prev_term)
