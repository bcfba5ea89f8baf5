"""Multi-crop SSL train step, process-isolated.

This is the heaviest single in-process program of the suite; in a shared
process the XLA:CPU client's accumulated state from even THREE prior
trainer tests slows its 8-device collective rendezvous from 80s to
700-1100s (see tests/conftest.py). Runs here in its own pytest process
via tests/test_serving_isolated.py. The cheap multicrop recipe
validation tests stay in tests/test_ssl_train.py."""

import numpy as np

from sm3x.core.config import (SSLConfig, DataConfig, ModelConfig,
                              OptimConfig, RunConfig)
from sm3x.core.mesh import shard_batch
from sm3x.core import prng
from sm3x.data.synthetic import synthetic_canvas_batch
from sm3x.train.backbone_train import SSLTrainer


def test_ssl_multicrop_train_step(tmp_path):
    """--data-name SevenPCSwavDataset wires the SwAV-style multi-crop
    step (VERDICT round 1: the name used to silently alias the base
    dataset with no multi-crop consumer): local views contribute a
    'local' NT-Xent term and the step trains."""
    # 2 locals (not more): compile cost grows with every unrolled local
    # encoder instance — this test cost 26 min at (2, 3) views @48px
    cfg = SSLConfig(
        data=DataConfig(data_name="SevenPCSwavDataset", img_sz=(32, 32),
                        size_crops=(32, 16), nmb_crops=(2, 2),
                        min_scale_crops=(0.5, 0.14),
                        max_scale_crops=(1.0, 0.5)),
        model=ModelConfig(arch="resnet18", arch_version="v32", proj_dim=16,
                          temperature=0.1, local_loss_weight=0.5),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-3, amp=False),
        run=RunConfig(log_path=str(tmp_path), seed=0, world_size=2),
    )
    t = SSLTrainer(cfg)
    canvases, hw, _ = synthetic_canvas_batch(8, canvas=64, seed=0)
    db = shard_batch(t.mesh, {
        "derm": canvases, "derm_hw": hw, "clinic": canvases, "clinic_hw": hw})
    rng = prng.step_rng(t.rng, 0, 0)
    losses = []
    for _ in range(3):
        t.state, metrics = t.train_step(
            t.state, db["derm"], db["derm_hw"],
            db["clinic"], db["clinic_hw"], rng)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(float(metrics["local"]))
    assert losses[-1] < losses[0], losses
    # total includes the weighted local term
    np.testing.assert_allclose(
        losses[-1],
        float(metrics["derm"]) + float(metrics["clinic"])
        + float(metrics["cross"]) + 0.5 * float(metrics["local"]),
        rtol=1e-5)
