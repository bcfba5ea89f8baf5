#!/usr/bin/env python
"""Diagnose the --bn-stat-freq ALTERNATION pathology (round 3).

bench.py's bnK mode (warm one call of each program, then time the
i%K schedule) measured 189 img/s at b=128 — 13x slower than the 2568
img/s tools/bench_bn_freq.py reported for the same alternation after its
30xtrain -> 30xfast warm order. Either the two executables ping-pong
layouts (per-step recompile / relayout copies over the tunnel) or some
other per-transition cost exists that a long same-program warm run hides.

This probe times INDIVIDUAL steps in both warm orders and watches the
jit executable cache sizes, which separates recompiles from copies:

  phase A (bench.py order):   train, fast  then 12 scheduled steps
  phase B (bench_bn_freq):    3xtrain, 3xfast, then 12 scheduled steps

Usage: python tools/bench_bn_alternation.py [batch] [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from sm3x.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from sm3x.core import prng
    from sm3x.core.config import (SSLConfig, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from sm3x.core.mesh import shard_batch
    from sm3x.data.synthetic import synthetic_canvas_batch
    from sm3x.train.backbone_train import SSLTrainer

    def fresh_trainer():
        cfg = SSLConfig(
            data=DataConfig(img_sz=(224, 224), cache_size=320),
            model=ModelConfig(arch="resnet50", arch_version="v32",
                              proj_dim=128, temperature=0.1,
                              use_pallas_augment=True, bn_stat_freq=K),
            optim=OptimConfig(epochs=1, batch_size=batch, base_lr=1e-6,
                              amp=True),
            run=RunConfig(log_path="/tmp/sm3x_bench_bnalt", seed=0),
        )
        return SSLTrainer(cfg)

    def run_phase(tag, warm_plan, n_timed):
        t = fresh_trainer()
        canvases, hw, _ = synthetic_canvas_batch(batch, canvas=320, seed=0)
        db = shard_batch(t.mesh, {"derm": canvases, "derm_hw": hw,
                                  "clinic": canvases, "clinic_hw": hw})

        def cache_sizes():
            try:
                return (t.train_step._cache_size(),
                        t.fast_step._cache_size())
            except Exception:
                return ("?", "?")

        def one(fn, i):
            t0 = time.perf_counter()
            t.state, m = fn(t.state, db["derm"], db["derm_hw"],
                            db["clinic"], db["clinic_hw"],
                            prng.step_rng(t.rng, 0, i))
            float(m["loss"])  # value-read sync (axon)
            return (time.perf_counter() - t0) * 1000.0

        print(f"\n=== {tag} ===", flush=True)
        i = 0
        for fn_name, reps in warm_plan:
            fn = getattr(t, fn_name)
            for _ in range(reps):
                ms = one(fn, i)
                print(f"warm {fn_name:10} step {i:3d}: {ms:8.1f} ms  "
                      f"caches {cache_sizes()}", flush=True)
                i += 1
        for j in range(n_timed):
            fn_name = "train_step" if j % K == 0 else "fast_step"
            ms = one(getattr(t, fn_name), i)
            print(f"sched {fn_name:10} step {i:3d}: {ms:8.1f} ms  "
                  f"caches {cache_sizes()}", flush=True)
            i += 1

    run_phase("A: bench.py order (1 warm call each)",
              [("train_step", 1), ("fast_step", 1)], 12)
    run_phase("B: bench_bn_freq order (3x each, then schedule)",
              [("train_step", 3), ("fast_step", 3)], 12)


if __name__ == "__main__":
    main()
