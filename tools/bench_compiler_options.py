#!/usr/bin/env python
"""Sweep XLA:TPU compiler options on the headline SSL train step.

The axon PJRT plugin rejects every `--xla_tpu_*` flag passed via the
XLA_FLAGS env var (its env parser has a reduced registry and crashes the
process on unknown flags), but PJRT `compiled = lowered.compile(
compiler_options=...)` ships options inside the compile request, which
the remote compiler validates and honors (a bogus option errors with
HTTP 500). This is therefore the ONLY working channel for TPU compiler
experiments on this platform.

Times the full stage-1 SSL step (bench.py recipe) per option set, warm
data, one process. Usage:
    python tools/bench_compiler_options.py [batch] [steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SWEEP = [
    ("baseline", {}),
    ("scoped_vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("rwb_fusion_off", {"xla_tpu_rwb_fusion": "false"}),
    ("latency_hiding", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("membound_loop_opt",
     {"xla_tpu_memory_bound_loop_optimizer_options": "enabled:true"}),
    ("bcast_priority",
     {"xla_tpu_enable_aggressive_broadcast_priority_update": "true"}),
    ("licm_fusion_extraction", {"xla_tpu_licm_fusion_extraction": "true"}),
    ("nested_loop_fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"}),
]


def main():
    import jax

    from sm3x.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from sm3x.core.config import (SSLConfig, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from sm3x.core.mesh import shard_batch
    from sm3x.core import prng
    from sm3x.data.synthetic import synthetic_canvas_batch
    from sm3x.train.backbone_train import SSLTrainer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    cfg = SSLConfig(
        data=DataConfig(img_sz=(224, 224), cache_size=320),
        model=ModelConfig(arch="resnet50", arch_version="v32", proj_dim=128,
                          temperature=0.1, use_pallas_augment=True),
        optim=OptimConfig(epochs=1, batch_size=batch, base_lr=1e-6, amp=True),
        run=RunConfig(log_path="/tmp/sm3x_bench", seed=0),
    )
    trainer = SSLTrainer(cfg)
    canvases, hw, _ = synthetic_canvas_batch(batch, canvas=320, seed=0)
    db = shard_batch(trainer.mesh, {
        "derm": canvases, "derm_hw": hw, "clinic": canvases, "clinic_hw": hw})
    rng = prng.step_rng(trainer.rng, 0, 0)
    args = (trainer.state, db["derm"], db["derm_hw"],
            db["clinic"], db["clinic_hw"], rng)
    lowered = trainer.train_step.lower(*args)

    init_state = trainer.state

    for name, opts in SWEEP:
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:
            print(json.dumps({"variant": name, "error": f"{type(e).__name__}: "
                              f"{str(e)[:160]}"}), flush=True)
            continue
        state = init_state
        # the step donates its state arg; rebuild a fresh copy per variant
        state = jax.tree.map(lambda x: x + 0, init_state)
        # warmup (sync via value read — axon block_until_ready lies)
        for i in range(2):
            state, m = compiled(state, db["derm"], db["derm_hw"],
                                db["clinic"], db["clinic_hw"],
                                prng.step_rng(trainer.rng, 0, i))
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = compiled(state, db["derm"], db["derm_hw"],
                                db["clinic"], db["clinic_hw"],
                                prng.step_rng(trainer.rng, 0, i + 2))
        float(m["loss"])
        dt = time.perf_counter() - t0
        print(json.dumps({
            "variant": name,
            "opts": opts,
            "img_per_sec_chip": round(4 * batch * steps / dt, 1),
            "step_ms": round(dt / steps * 1e3, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
