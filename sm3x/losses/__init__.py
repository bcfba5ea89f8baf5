"""Loss APIs (SURVEY §7 layer 3).

* NT-Xent — see sm3x.ops.ntxent (re-exported here)
* per-label weighted cross-entropy — mlc_eval.py:159-162
* cluster CE with ignore_index=-100 — mlc_train.py:255-261,381
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sm3x.ops.ntxent import (  # noqa: F401
    ntxent_loss,
    ntxent_logits,
    grouped_ntxent_loss,
    ntxent_loss_from_logits,
)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over the batch; logits (B, C), integer labels (B,)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    return -jnp.mean(picked)


def weighted_multilabel_ce(logits_list, labels, label_weights) -> jax.Array:
    """sum_i w_i * CE(logits_i, labels[:, i]) / num_labels
    (reference: tools/mlc_eval.py:159-162)."""
    num = len(logits_list)
    total = 0.0
    for i, logits in enumerate(logits_list):
        total = total + label_weights[i] * cross_entropy(logits, labels[:, i])
    return total / num


def cluster_ce(logits: jax.Array, assignments: jax.Array, temperature: float) -> jax.Array:
    """CE(pred / T, assignment) with ignore_index=-100 semantics: ignored
    rows contribute nothing to numerator or denominator
    (reference: tools/mlc_train.py:255-261 with nn.CrossEntropyLoss(ignore_index=-100))."""
    valid = assignments != -100
    safe = jnp.where(valid, assignments, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32) / temperature, axis=-1)
    picked = jnp.take_along_axis(logp, safe[:, None].astype(jnp.int32), axis=1)[:, 0]
    picked = jnp.where(valid, picked, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(picked) / denom
