#!/usr/bin/env python
"""Probe: --bn-stat-freq throughput on the FULL SSL train step.

BENCH.md round 2 established that train-mode BN's batch-statistic pass
(+41% of forward) cannot be fused away on this platform (ghost-batch,
stale-stats, bf16-stat and compiler-option probes all flat) — the only
structural escape is not computing batch statistics every step. This
tool measures that lever end-to-end: the standard stage-1 SSL step
(dual ResNet-50, fused aug, 3x NT-Xent, AdamW) vs the --bn-stat-freq
fast step (eval-BN forward, no stat pass, same gradient update), plus a
real alternating K=4 schedule, all with dispatched steps and value-read
syncs (bench.py methodology).

Usage: python tools/bench_bn_freq.py [batch] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    from sm3x.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from sm3x.core import prng
    from sm3x.core.config import (SSLConfig, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from sm3x.core.mesh import shard_batch
    from sm3x.data.synthetic import synthetic_canvas_batch
    from sm3x.train.backbone_train import SSLTrainer

    cfg = SSLConfig(
        data=DataConfig(img_sz=(224, 224), cache_size=320),
        model=ModelConfig(arch="resnet50", arch_version="v32", proj_dim=128,
                          temperature=0.1, use_pallas_augment=True,
                          bn_stat_freq=4),
        optim=OptimConfig(epochs=1, batch_size=batch, base_lr=1e-6, amp=True),
        run=RunConfig(log_path="/tmp/sm3x_bench_bnfreq", seed=0),
    )
    trainer = SSLTrainer(cfg)
    canvases, hw, _ = synthetic_canvas_batch(batch, canvas=320, seed=0)
    db = shard_batch(trainer.mesh, {
        "derm": canvases, "derm_hw": hw, "clinic": canvases, "clinic_hw": hw})

    def timed(tag, pick):
        """pick(i) -> step fn; dispatched loop, scalar-read sync."""
        for i in range(2):  # compile + warm both programs
            trainer.state, m = pick(i)(
                trainer.state, db["derm"], db["derm_hw"],
                db["clinic"], db["clinic_hw"],
                prng.step_rng(trainer.rng, 0, i))
            float(m["loss"])
        t0 = time.perf_counter()
        for i in range(steps):
            trainer.state, m = pick(i)(
                trainer.state, db["derm"], db["derm_hw"],
                db["clinic"], db["clinic_hw"],
                prng.step_rng(trainer.rng, 0, i + 2))
        float(m["loss"])
        dt = (time.perf_counter() - t0) / steps
        rate = 4 * batch / dt
        print(f"{tag}: {rate:,.0f} img/s  ({dt * 1e3:.1f} ms/step)",
              flush=True)
        return rate

    # warm the refresh step first so the fast step starts from sane stats
    slow = timed(f"train-BN step (reference semantics, b={batch})",
                 lambda i: trainer.train_step)
    fast = timed(f"eval-BN fast step (b={batch})",
                 lambda i: trainer.fast_step)
    k4 = timed(f"alternating --bn-stat-freq 4 (b={batch})",
               lambda i: trainer.train_step if i % 4 == 0
               else trainer.fast_step)

    print(f"\nfast/slow: {fast / slow:.3f}x   measured K=4: {k4 / slow:.3f}x")
    for k in (2, 4, 8):
        eff = k / ((k - 1) / fast + 1 / slow)
        print(f"projected K={k}: {eff:,.0f} img/s ({eff / slow:.3f}x)")


if __name__ == "__main__":
    main()
