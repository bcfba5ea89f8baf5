"""NT-Xent parity vs a torch oracle that re-states the reference's
logits construction (simclr.py:54-93) independently."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sm3x.ops.ntxent import (
    ntxent_loss,
    ntxent_logits,
    grouped_ntxent_loss,
    ntxent_loss_from_logits,
)


def torch_ntxent(z1, z2, temperature):
    """Oracle: the SimCLR in-batch logits construction, torch semantics."""
    bs = z1.shape[0]
    features = torch.cat([z1, z2], dim=0)
    features = F.normalize(features, dim=1)
    labels = torch.cat([torch.arange(bs) for _ in range(2)], dim=0)
    labels = (labels.unsqueeze(0) == labels.unsqueeze(1)).float()
    sim = features @ features.T
    mask = torch.eye(labels.shape[0], dtype=torch.bool)
    labels = labels[~mask].view(labels.shape[0], -1)
    sim = sim[~mask].view(sim.shape[0], -1)
    positives = sim[labels.bool()].view(labels.shape[0], -1)
    negatives = sim[~labels.bool()].view(sim.shape[0], -1)
    logits = torch.cat([positives, negatives], dim=1) / temperature
    target = torch.zeros(logits.shape[0], dtype=torch.long)
    return logits, F.cross_entropy(logits, target)


@pytest.mark.parametrize("b,d,t", [(8, 16, 0.1), (16, 32, 0.5), (5, 7, 1.0)])
def test_loss_matches_torch(rng_np, b, d, t):
    z1 = rng_np.normal(size=(b, d)).astype(np.float32)
    z2 = rng_np.normal(size=(b, d)).astype(np.float32)
    ref_logits, ref_loss = torch_ntxent(torch.tensor(z1), torch.tensor(z2), t)
    got = ntxent_loss(jnp.array(z1), jnp.array(z2), t)
    np.testing.assert_allclose(float(got), float(ref_loss), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,d,t", [(8, 16, 0.1), (4, 8, 0.5)])
def test_logits_layout_matches_torch(rng_np, b, d, t):
    z1 = rng_np.normal(size=(b, d)).astype(np.float32)
    z2 = rng_np.normal(size=(b, d)).astype(np.float32)
    ref_logits, ref_loss = torch_ntxent(torch.tensor(z1), torch.tensor(z2), t)
    logits, labels = ntxent_logits(jnp.array(z1), jnp.array(z2), t)
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), rtol=1e-5, atol=1e-5
    )
    assert np.all(np.asarray(labels) == 0)
    loss = ntxent_loss_from_logits(logits, labels)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5, atol=1e-5)


def test_grouped_equals_mean_of_per_group(rng_np):
    b, d, t, g = 16, 8, 0.3, 4
    z1 = rng_np.normal(size=(b, d)).astype(np.float32)
    z2 = rng_np.normal(size=(b, d)).astype(np.float32)
    got = grouped_ntxent_loss(jnp.array(z1), jnp.array(z2), t, groups=g)
    per = []
    for i in range(g):
        s = slice(i * b // g, (i + 1) * b // g)
        _, l = torch_ntxent(torch.tensor(z1[s]), torch.tensor(z2[s]), t)
        per.append(float(l))
    np.testing.assert_allclose(float(got), np.mean(per), rtol=1e-5, atol=1e-5)


def test_grouped_one_group_is_global(rng_np):
    z1 = rng_np.normal(size=(8, 8)).astype(np.float32)
    z2 = rng_np.normal(size=(8, 8)).astype(np.float32)
    a = grouped_ntxent_loss(jnp.array(z1), jnp.array(z2), 0.5, groups=1)
    b = ntxent_loss(jnp.array(z1), jnp.array(z2), 0.5)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_gradients_finite(rng_np):
    import jax

    z1 = jnp.array(rng_np.normal(size=(8, 16)).astype(np.float32))
    z2 = jnp.array(rng_np.normal(size=(8, 16)).astype(np.float32))
    g1, g2 = jax.grad(lambda a, b: ntxent_loss(a, b, 0.1), argnums=(0, 1))(z1, z2)
    assert np.all(np.isfinite(np.asarray(g1)))
    assert np.all(np.isfinite(np.asarray(g2)))
