#!/usr/bin/env python
"""Measure stage-2/3/4 train-step throughput on the TPU.

bench.py covers stage 1 (SSL pretrain) and BENCH.md covers inference;
this tool completes the pipeline: one JSON line per remaining stage at
the reference recipe's configuration (run.sh:16-62):

  mlc_train      — DeepCluster MLC step, b=256, frozen extractor,
                   proj v4 dim 512, 1-head SA, bank slot update
                   (reference tools/mlc_train.py:198-285)
  mlc_eval       — supervised finetune step, b=128, finetune=projector
                   (reference tools/mlc_eval.py:113-199)
  backbone_eval  — Baseline + 8 linear heads, b=128, finetune=fc
                   (reference tools/backbone_eval.py:215-430)

Each step counts 2 encoder images per paired case (1 view/modality).
Sync is by value read (block_until_ready returns early on axon).

Usage: python tools/bench_stages.py [steps] [arch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name, fn, batch, steps):
    fn(0), fn(1)  # compile + warm (each call ends in a value read)
    t0 = time.perf_counter()
    for i in range(steps):
        fn(i + 2)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"{name}_images_per_sec_per_chip",
        "value": round(2 * batch * steps / dt, 1),
        "unit": f"encoder images/sec/chip (224x224, b={batch} cases)",
    }))


def main():
    import jax
    import jax.numpy as jnp

    from sm3x.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from sm3x.core import prng
    from sm3x.core.config import (DataConfig, EvalConfig, MLCTrainConfig,
                                  ModelConfig, OptimConfig, RunConfig)
    from sm3x.core.mesh import replicate, shard_batch
    from sm3x.data.synthetic import synthetic_canvas_batch

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    arch = sys.argv[2] if len(sys.argv) > 2 else "resnet50"
    run = RunConfig(log_path="/tmp/sm3x_bench_stages", seed=0)
    data = DataConfig(img_sz=(224, 224), cache_size=320)

    # ---- stage 2: DeepCluster MLC train step (run.sh:32-44) --------------
    from sm3x.train.mlc_train import MLCTrainer

    b2 = 256
    mlc = MLCTrainer(MLCTrainConfig(
        data=data,
        model=ModelConfig(arch=arch, mlc_proj="v4", mlc_proj_dim=512,
                          num_heads=1, sa_dim_ff=128, sa_dropout=0.1,
                          temperature=1.0),
        optim=OptimConfig(epochs=1, batch_size=b2, base_lr=1e-4, amp=True),
        run=run))
    canv, hw, _ = synthetic_canvas_batch(b2, canvas=320, seed=0)
    db = shard_batch(mlc.mesh, {"derm": canv, "derm_hw": hw,
                                "clinic": canv, "clinic_hw": hw})
    n_bank = 1024
    bank = replicate(mlc.mesh, jnp.zeros((8, n_bank, 512), jnp.float32))
    assignments = replicate(mlc.mesh, jnp.zeros((8, n_bank), jnp.int32))
    idx = replicate(mlc.mesh, jnp.arange(b2, dtype=jnp.int32) % n_bank)
    state = {"s": mlc.state, "b": bank}

    def mlc_step(i):
        state["s"], state["b"], loss = mlc.train_step(
            state["s"], state["b"], db["derm"], db["derm_hw"],
            db["clinic"], db["clinic_hw"], idx, assignments,
            prng.step_rng(mlc.rng, 0, i))
        return float(loss)

    bench("mlc_train_step", mlc_step, b2, steps)

    # ---- stage 3: supervised MLC finetune step (run.sh:46-62) ------------
    from sm3x.train.mlc_eval import MLCEvalTrainer

    b3 = 128
    ev = MLCEvalTrainer(EvalConfig(
        data=data,
        model=ModelConfig(arch=arch, mlc_proj="v4", mlc_proj_dim=512,
                          num_heads=1, sa_dim_ff=128, sa_dropout=0.1,
                          finetune="projector"),
        train_sz=224, test_sz=224,
        optim=OptimConfig(epochs=1, batch_size=b3, base_lr=1e-3, amp=True),
        run=run))
    canv3, hw3, _ = synthetic_canvas_batch(b3, canvas=320, seed=1)
    db3 = shard_batch(ev.mesh, {"derm": canv3, "derm_hw": hw3,
                                "clinic": canv3, "clinic_hw": hw3})
    labels = replicate(ev.mesh, jnp.zeros((b3, 8), jnp.int32))
    est = {"s": ev.state}

    def ev_step(i):
        est["s"], loss, _ = ev.train_step(
            est["s"], db3["derm"], db3["derm_hw"], db3["clinic"],
            db3["clinic_hw"], labels, prng.step_rng(ev.rng, 0, i))
        return float(loss)

    bench("mlc_eval_step", ev_step, b3, steps)

    # ---- backbone eval step (run.sh:16-30) -------------------------------
    from sm3x.train.backbone_eval import BackboneEvalTrainer

    be = BackboneEvalTrainer(EvalConfig(
        data=data,
        model=ModelConfig(arch=arch, finetune="fc"),
        train_sz=224, test_sz=224,
        optim=OptimConfig(epochs=1, batch_size=b3, base_lr=1e-3, amp=True),
        run=run))
    bst = {"s": be.state}

    def be_step(i):
        bst["s"], loss, _ = be.train_step(
            bst["s"], db3["derm"], db3["derm_hw"], db3["clinic"],
            db3["clinic_hw"], labels, prng.step_rng(be.rng, 0, i))
        return float(loss)

    bench("backbone_eval_step", be_step, b3, steps)


if __name__ == "__main__":
    main()
