#!/usr/bin/env python
"""Dataset channel mean/std computation (reference tools/misc/
cal_mean_std.py:41-61), TPU-style: one jitted reduction over the cached
uint8 canvases instead of a per-batch GPU accumulation loop."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

from sm3x.data.derm7pt import Derm7ptMeta
from sm3x.data.pipeline import ImageStore


def channel_mean_std(store: ImageStore):
    """Mean/std over valid pixels only (the letterbox padding is excluded)."""
    total = np.zeros(3, np.float64)
    total_sq = np.zeros(3, np.float64)
    count = 0
    for canvas, (h, w) in zip(store.canvases, store.valid_hw):
        x = jnp.asarray(canvas[:h, :w], jnp.float32) / 255.0
        total += np.asarray(jnp.sum(x, axis=(0, 1)), np.float64)
        total_sq += np.asarray(jnp.sum(x * x, axis=(0, 1)), np.float64)
        count += int(h) * int(w)
    mean = total / count
    std = np.sqrt(total_sq / count - mean ** 2)
    return mean, std


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", required=True)
    p.add_argument("--cache-size", type=int, default=512)
    args = p.parse_args()

    meta = Derm7ptMeta(args.data_path)
    derm, clinic, _ = meta.examples("train")
    store = ImageStore(derm + clinic, args.cache_size, meta.crop_amount)
    mean, std = channel_mean_std(store)
    print("mean:", " ".join(f"{v:.4f}" for v in mean))
    print("std: ", " ".join(f"{v:.4f}" for v in std))
