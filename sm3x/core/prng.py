"""PRNG discipline.

The reference seeds python/numpy/torch RNGs once
(/root/reference/src/utils/misc.py:228-235, seed 3407) and then relies on
stateful draws. JAX is functional: we derive every stochastic consumer
(augmentation, dropout, k-means init) from the root key with `fold_in`,
keyed by epoch/step, so any step is reproducible in isolation and
independent of execution order.
"""

from __future__ import annotations

import jax

DEFAULT_SEED = 3407  # reference default, src/utils/misc.py:193


def root_key(seed: int = DEFAULT_SEED) -> jax.Array:
    return jax.random.key(seed)


def step_rng(key: jax.Array, epoch: int, step) -> jax.Array:
    """Per-step key: fold epoch then step (step may be traced)."""
    key = jax.random.fold_in(key, epoch)
    return jax.random.fold_in(key, step)


def fold_in_axis(key: jax.Array, name: str) -> jax.Array:
    """Distinct stream per named consumer (e.g. 'aug', 'dropout')."""
    # stable hash of the name — avoid Python hash() randomization
    h = 0
    for ch in name:
        h = (h * 131 + ord(ch)) % (2**31 - 1)
    return jax.random.fold_in(key, h)
