"""Jitted spherical k-means for the DeepCluster loop.

The reference's `cluster_memory` (/root/reference/tools/mlc_train.py:116-189)
gathers all embeddings to rank 0, runs a 10-iteration serial k-means on
the GPU + scipy-CSR index trick, then broadcasts centroids/assignments.
TPU-natively there is no rank-0 detour: the memory bank lives on device,
and the whole E/M loop is a `lax.fori_loop` of MXU matmuls + segment
sums, identical (and deterministic) on every replica, so the "broadcast"
is free — every chip computes the same result from the same inputs.

Semantics preserved:
* init = K distinct random rows (randperm[:K], mlc_train.py:146-147)
* E-step: argmax dot product (dot_products.max(dim=1), :153-154)
* M-step: mean of assigned rows; empty clusters keep their previous
  centroid (mask, :173-174); ALL centroids L2-renormalized each
  iteration (:177)
* one extra E-step after the last M-step produces the assignments
  (:150-158 runs iters+1 with break)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "iters"))
def spherical_kmeans(
    rng: jax.Array,
    embeddings: jax.Array,
    k: int,
    iters: int = 10,
):
    """Returns (centroids (K, D) f32, assignments (N,) int32)."""
    emb = embeddings.astype(jnp.float32)
    n, d = emb.shape

    perm = jax.random.permutation(rng, n)
    centroids = emb[perm[:k]]

    def assign(c):
        # (N, K) dot products on the MXU; argmax over clusters
        return jnp.argmax(emb @ c.T, axis=1).astype(jnp.int32)

    def m_step(c, a):
        one_hot = jax.nn.one_hot(a, k, dtype=jnp.float32)        # (N, K)
        counts = jnp.sum(one_hot, axis=0)                        # (K,)
        sums = one_hot.T @ emb                                   # (K, D)
        mean = sums / jnp.maximum(counts, 1.0)[:, None]
        c = jnp.where((counts > 0)[:, None], mean, c)
        # normalize all centroids (reference renorms unconditionally)
        norm = jnp.sqrt(jnp.sum(jnp.square(c), axis=1, keepdims=True))
        return c / jnp.maximum(norm, 1e-12)

    def body(_, c):
        return m_step(c, assign(c))

    centroids = jax.lax.fori_loop(0, iters, body, centroids)
    assignments = assign(centroids)
    return centroids, assignments


def scatter_assignments(assignments: jax.Array, indexes: jax.Array, total: int):
    """Reference semantics: a (-100)-filled vector of length `total` with
    `assignments` written at positions `indexes` (mlc_train.py:125,183)."""
    out = jnp.full((total,), -100, dtype=jnp.int32)
    return out.at[indexes].set(assignments.astype(jnp.int32))
