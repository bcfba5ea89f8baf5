"""NT-Xent (normalized-temperature cross-entropy) contrastive loss.

Re-derivation of the reference's logits construction
(/root/reference/src/models/simclr.py:54-93 and :290-322): two views'
projected features are concatenated to ``z = [z1; z2]`` (2B rows),
L2-normalized, and the (2B, 2B) cosine-similarity matrix is formed. The
diagonal is dropped; the single positive per row (its pair at ``i ± B``)
is moved to column 0, the 2B-2 negatives follow; cross-entropy against
target 0 at temperature ``T`` gives the loss.

TPU-first design notes
----------------------
* The column shuffle is irrelevant to the CE value, so the hot path
  (`ntxent_loss`) never materializes the gathered (2B, 2B-1) matrix:
  ``loss_i = -sim[i, pos(i)]/T + logsumexp_{j != i}(sim[i, j]/T)``.
  One (2B, D) x (D, 2B) matmul on the MXU plus a masked row reduction —
  XLA fuses the mask, scale and logsumexp into the matmul's epilogue.
* `ntxent_logits` keeps the reference's exact (positives-first) layout
  for parity tests and for callers that want the raw logits.
* The reference contrasts only within each device's sub-batch (SURVEY
  §2c: DDP never all-gathers features). `grouped_ntxent_loss` reproduces
  that by folding a group axis out of the global batch and vmapping —
  the jitted global-batch program stays identical on 1 or N chips while
  matching the reference's loss scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def _normalize(z, eps: float = 1e-12):
    # F.normalize semantics: x / max(||x||_2, eps)
    n = jnp.sqrt(jnp.sum(jnp.square(z), axis=-1, keepdims=True))
    return z / jnp.maximum(n, eps)


def _similarity(z1, z2, dtype=jnp.float32):
    """(2B, 2B) cosine similarity of the concatenated, normalized views."""
    z = jnp.concatenate([z1, z2], axis=0).astype(dtype)
    z = _normalize(z)
    return z @ z.T


def ntxent_loss(z1: jax.Array, z2: jax.Array, temperature: float) -> jax.Array:
    """Fused NT-Xent: mean CE over the 2B rows. z1, z2: (B, D) projections."""
    b = z1.shape[0]
    sim = _similarity(z1, z2) / temperature
    n = 2 * b
    eye = jnp.eye(n, dtype=bool)
    # positive for row i is column (i + B) mod 2B
    pos_idx = (jnp.arange(n) + b) % n
    pos = jnp.take_along_axis(sim, pos_idx[:, None], axis=1)[:, 0]
    lse = jax.nn.logsumexp(jnp.where(eye, _NEG_INF, sim), axis=1)
    return jnp.mean(lse - pos)


def ntxent_logits(z1: jax.Array, z2: jax.Array, temperature: float):
    """Reference-layout logits: (2B, 2B-1) with the positive at column 0,
    negatives following in increasing-column order (diagonal removed);
    labels are all zeros. Matches simclr.py:54-93 elementwise."""
    b = z1.shape[0]
    n = 2 * b
    sim = _similarity(z1, z2)
    eye = jnp.eye(n, dtype=bool)
    pos_idx = (jnp.arange(n) + b) % n
    positives = jnp.take_along_axis(sim, pos_idx[:, None], axis=1)
    # negatives: all columns except the diagonal and the positive, in order.
    col = jnp.arange(n)[None, :]
    row = jnp.arange(n)[:, None]
    keep = (col != row) & (col != pos_idx[:, None])  # (n, n), n-2 kept per row
    # Stable compaction: sort by (dropped, col) so kept columns come first
    # in increasing column order, then slice the first n-2.
    order = jnp.argsort(jnp.where(keep, col, n + col), axis=1)[:, : n - 2]
    negatives = jnp.take_along_axis(sim, order, axis=1)
    logits = jnp.concatenate([positives, negatives], axis=1) / temperature
    labels = jnp.zeros((n,), dtype=jnp.int32)
    return logits, labels


def grouped_ntxent_loss(
    z1: jax.Array, z2: jax.Array, temperature: float, groups: int = 1
) -> jax.Array:
    """NT-Xent with negatives local to each of `groups` equal sub-batches.

    groups = reference `world_size` reproduces DDP's per-device negatives
    (loss magnitude depends on the per-device batch, SURVEY §2c); groups=1
    is global negatives. The group axis folds out of the batch dim, so
    under a data-sharded jit each group's matmul stays on one chip.
    """
    b, d = z1.shape
    if groups == 1:
        return ntxent_loss(z1, z2, temperature)
    assert b % groups == 0, f"batch {b} not divisible by groups {groups}"
    z1g = z1.reshape(groups, b // groups, d)
    z2g = z2.reshape(groups, b // groups, d)
    losses = jax.vmap(lambda a, c: ntxent_loss(a, c, temperature))(z1g, z2g)
    return jnp.mean(losses)


def ntxent_loss_from_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """CE(logits, labels) with mean reduction — for the explicit-logits path."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1))
