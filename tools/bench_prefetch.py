#!/usr/bin/env python
"""Measure the three device-feeding strategies on the real TPU.

The reference hides H2D behind DataLoader worker processes + pinned-memory
copies (reference src/utils/misc.py:450-458). sm3x has three TPU-native
answers, picked automatically by sm3x.data.prefetch.wrap_for_device:

  sync      — host batches, blocking shard_batch upload on the step path
              (the strategy of last resort; what the fallback used to be)
  prefetch  — PrefetchData: a background thread enqueues device_put
              transfers depth batches ahead (H2D rides under compute)
  resident  — DeviceData: whole canvas cache lives in HBM, zero per-step
              upload (only fits datasets a fraction of HBM in size)
  stream    — PrefetchData over StreamingPairedData (--no-cache-images):
              JPEG decode AND upload both ride under compute; O(batch)
              host memory (the path for splits beyond host RAM)

Runs the REAL stage-1 SSL step (dual encoder, fused aug, 3x NT-Xent,
AdamW) over an on-disk fake Derm7pt so the full gather+upload path is
exercised. Prints one JSON line per strategy.

Usage: python tools/bench_prefetch.py [n_cases] [batch] [epochs] [arch]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from sm3x.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from sm3x.core.config import (SSLConfig, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from sm3x.data.datasets import build_dataset
    from sm3x.data.device_data import DeviceData
    from sm3x.data.prefetch import PrefetchData
    from sm3x.data.synthetic import make_fake_derm7pt
    from sm3x.train.backbone_train import SSLTrainer

    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 4  # 1 warm + rest timed
    if epochs < 2:
        sys.exit("epochs must be >= 2 (first epoch is compile warmup)")
    arch = sys.argv[4] if len(sys.argv) > 4 else "resnet50"

    root = os.path.join(tempfile.gettempdir(), f"sm3x_prefetch_bench_{n_cases}")
    if not os.path.exists(os.path.join(root, "meta.csv")):
        make_fake_derm7pt(root, n_cases=n_cases, img_size=300)
    data = build_dataset("SevenPCBaseDataset", root, "train", cache_size=256)

    cfg = SSLConfig(
        data=DataConfig(img_sz=(224, 224), cache_size=256),
        model=ModelConfig(arch=arch, arch_version="v32", proj_dim=128,
                          temperature=0.1, use_pallas_augment=True),
        optim=OptimConfig(epochs=1, batch_size=batch, base_lr=1e-6, amp=True),
        run=RunConfig(log_path="/tmp/sm3x_prefetch_bench", seed=0,
                      print_freq=10**9),
    )
    trainer = SSLTrainer(cfg)
    steps = data.steps_per_epoch(batch)
    upload_mb = 2 * batch * 256 * 256 * 3 / 1e6

    variants = {
        "sync": lambda: data,
        "prefetch": lambda: PrefetchData(data, trainer.mesh, depth=2),
        "resident": lambda: DeviceData(data, trainer.mesh),
        "stream": lambda: PrefetchData(
            build_dataset("SevenPCBaseDataset", root, "train",
                          cache_size=256, streaming=True),
            trainer.mesh, depth=2),
    }
    for name, make in variants.items():
        feed = make()
        trainer.train_epoch(feed, 0)  # warm: compile + (resident) upload
        rates = []
        for e in range(1, epochs):
            t0 = time.perf_counter()
            trainer.train_epoch(feed, e)  # ends with a loss value read
            dt = time.perf_counter() - t0
            rates.append(4 * batch * steps / dt)
        rates.sort()
        print(json.dumps({
            "metric": f"ssl_feed_{name}_images_per_sec",
            "value": round(rates[len(rates) // 2], 1),
            "unit": (f"images/sec ({arch}, b={batch}, {steps} steps/epoch, "
                     f"{upload_mb:.1f} MB canvases/step, median of "
                     f"{len(rates)} epochs)"),
        }))


if __name__ == "__main__":
    main()
