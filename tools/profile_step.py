#!/usr/bin/env python
"""Capture an XLA/TPU profile of the stage-1 train step.

    python tools/profile_step.py --batch-size 128 --steps 5 --out /tmp/trace

View the trace with TensorBoard's profile plugin / xprof. (SURVEY §5:
the reference has only wall-clock meters; this is the TPU-native
tracing hook.)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--out", default="/tmp/sm3x_trace")
    p.add_argument("-a", "--arch", default="resnet50")
    args = p.parse_args()

    import jax

    from sm3x.core.cache import enable_compilation_cache
    from sm3x.core.config import SSLConfig, DataConfig, ModelConfig, OptimConfig, RunConfig
    from sm3x.core.mesh import shard_batch
    from sm3x.core import prng
    from sm3x.data.synthetic import synthetic_canvas_batch
    from sm3x.train.backbone_train import SSLTrainer
    from sm3x.utils.profiling import trace, annotate

    enable_compilation_cache()
    cfg = SSLConfig(
        data=DataConfig(img_sz=(224, 224)),
        model=ModelConfig(arch=args.arch, arch_version="v32", proj_dim=128,
                          temperature=0.1),
        optim=OptimConfig(epochs=1, batch_size=args.batch_size, base_lr=1e-6,
                          amp=True),
        run=RunConfig(log_path="/tmp/sm3x_profile", seed=0),
    )
    trainer = SSLTrainer(cfg)
    canv, hw, _ = synthetic_canvas_batch(args.batch_size, canvas=320, seed=0)
    db = shard_batch(trainer.mesh, {
        "derm": canv, "derm_hw": hw, "clinic": canv, "clinic_hw": hw})

    # warm up / compile outside the trace
    state, m = trainer.train_step(
        trainer.state, db["derm"], db["derm_hw"], db["clinic"],
        db["clinic_hw"], prng.step_rng(trainer.rng, 0, 0))
    trainer.state = state
    jax.block_until_ready(m["loss"])

    with trace(args.out):
        for i in range(args.steps):
            with annotate(f"ssl_step_{i}"):
                trainer.state, m = trainer.train_step(
                    trainer.state, db["derm"], db["derm_hw"],
                    db["clinic"], db["clinic_hw"],
                    prng.step_rng(trainer.rng, 0, i + 1))
        jax.block_until_ready(m["loss"])
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
