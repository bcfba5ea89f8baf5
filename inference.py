#!/usr/bin/env python
"""Minimal public inference API (parity with /root/reference/inference.py).

Rebuilds the released SM3 model (dual ResNet-50 extractor + 8 per-label
projectors + 1 transformer-encoder mixing layer + 8 prototype heads),
loads `best_linear.pth` / `best_finetune.pth` with the `encoder.`-prefix
strip (reference inference.py:124-126), and runs a dummy forward — all
jit-compiled for TPU. The class constants below mirror inference.py:8-13.
"""

import sys

import numpy as np

import jax.numpy as jnp

from sm3x import CLASSES_NAME, NUM_CLASSES, CLS_WEIGHTS, CLASSES_NAME_2  # noqa: F401
from sm3x.api import build_evaluator, load_weights, predict_fn  # noqa: F401


if __name__ == "__main__":
    arch = "resnet50"
    mlc_proj_dim = 512
    num_labels = 8
    l2_norm = False
    num_heads = 1
    sa_dim_ff = 128
    sa_dropout = 0.1
    pretrain_path = sys.argv[1] if len(sys.argv) > 1 else "./best_finetune.pth"

    evaluator = build_evaluator(arch, mlc_proj_dim, num_labels, l2_norm,
                                num_heads, sa_dim_ff, sa_dropout)
    print(f"Loading pre-trained weights from '{pretrain_path}' ...")
    variables = load_weights(pretrain_path, arch)
    print(f"loaded pre-trained model weights from '{pretrain_path}'")

    fwd = predict_fn(evaluator, variables)
    dummy_derm = jnp.asarray(np.random.randn(1, 224, 224, 3), jnp.float32)
    dummy_clinic = jnp.asarray(np.random.randn(1, 224, 224, 3), jnp.float32)
    preds = fwd(dummy_derm, dummy_clinic)
    for name, p in zip(CLASSES_NAME, preds):
        print(name, np.asarray(p))
