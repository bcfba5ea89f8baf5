"""CE loss parity vs torch: ignore_index=-100 cluster CE (mlc_train.py:381)
and per-label weighted CE (mlc_eval.py:159-162)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sm3x.losses import cross_entropy, cluster_ce, weighted_multilabel_ce


def test_cross_entropy_matches_torch(rng_np):
    logits = rng_np.normal(size=(16, 5)).astype(np.float32)
    labels = rng_np.integers(0, 5, 16)
    want = float(F.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cluster_ce_ignore_index(rng_np):
    logits = rng_np.normal(size=(12, 4)).astype(np.float32)
    labels = rng_np.integers(0, 4, 12)
    labels[[2, 5, 7]] = -100
    t = 0.7
    want = float(F.cross_entropy(torch.tensor(logits) / t,
                                 torch.tensor(labels), ignore_index=-100))
    got = float(cluster_ce(jnp.asarray(logits), jnp.asarray(labels), t))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cluster_ce_all_ignored_is_finite():
    logits = jnp.zeros((4, 3))
    labels = jnp.full((4,), -100)
    assert np.isfinite(float(cluster_ce(logits, labels, 1.0)))


def test_weighted_multilabel_ce_matches_torch(rng_np):
    num_classes = [5, 3, 2]
    weights = [1.0, 2.0, 0.5]
    n = 10
    logits = [rng_np.normal(size=(n, c)).astype(np.float32) for c in num_classes]
    labels = np.stack([rng_np.integers(0, c, n) for c in num_classes], axis=1)
    want = 0.0
    for i in range(3):
        want += weights[i] * float(F.cross_entropy(
            torch.tensor(logits[i]), torch.tensor(labels[:, i])))
    want /= 3
    got = float(weighted_multilabel_ce(
        [jnp.asarray(l) for l in logits], jnp.asarray(labels), weights))
    np.testing.assert_allclose(got, want, rtol=1e-5)
