"""SSL evaluators (reference src/models/evaluator.py).

* LogisticRegress{,MultiHead}Evaluator live in sm3x.models.baseline
  (re-exported here).
* `knn_predict` / `knn_eval` — the weighted-kNN online probe
  (evaluator.py:11-120), jit-compiled: one (B, N) similarity matmul on
  the MXU + top-k + temperature-weighted class votes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sm3x.models.baseline import (  # noqa: F401
    LogisticRegressEvaluator,
    MultiHeadClassifier as LogisticRegressMultiHeadEvaluator,
)


@partial(jax.jit, static_argnames=("k", "num_classes"))
def knn_predict(query, feature_bank, target_bank, num_classes: int,
                k: int = 200, temperature: float = 0.07):
    """Weighted kNN class scores (evaluator.py:43-83 semantics).

    query (B, D) and feature_bank (N, D) are L2-normalized features;
    returns (B, num_classes) scores (argmax = prediction)."""
    sim = query @ feature_bank.T                     # (B, N) cosine
    weight, idx = jax.lax.top_k(sim, k)              # (B, k)
    labels = target_bank[idx]                        # (B, k)
    weight = jnp.exp(weight / temperature)
    one_hot = jax.nn.one_hot(labels, num_classes)    # (B, k, C)
    return jnp.sum(one_hot * weight[..., None], axis=1)


def knn_eval(extract_fn, train_batches, val_batches, num_classes: int,
             k: int = 200, temperature: float = 0.07):
    """Top-1 weighted-kNN accuracy of an embedding function.

    extract_fn(batch) -> (features (B, D), labels (B,)); iterables of
    batches for bank and queries. Returns float accuracy."""
    import numpy as np

    feats, labs = [], []
    for b in train_batches:
        f, y = extract_fn(b)
        n = jnp.sqrt(jnp.sum(jnp.square(f), axis=1, keepdims=True))
        feats.append(np.asarray(f / jnp.maximum(n, 1e-12)))
        labs.append(np.asarray(y))
    bank = jnp.asarray(np.concatenate(feats))
    bank_y = jnp.asarray(np.concatenate(labs))

    correct = total = 0
    kk = min(k, bank.shape[0])
    for b in val_batches:
        f, y = extract_fn(b)
        n = jnp.sqrt(jnp.sum(jnp.square(f), axis=1, keepdims=True))
        scores = knn_predict(f / jnp.maximum(n, 1e-12), bank, bank_y,
                             num_classes, kk, temperature)
        pred = np.asarray(jnp.argmax(scores, axis=1))
        correct += int((pred == np.asarray(y)).sum())
        total += len(pred)
    return correct / max(total, 1)
