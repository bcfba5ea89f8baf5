"""Spherical k-means parity vs a numpy oracle of the reference's E/M loop
(mlc_train.py:145-189 semantics)."""

import numpy as np

import jax
import jax.numpy as jnp

from sm3x.ops.kmeans import spherical_kmeans, scatter_assignments


def numpy_kmeans(init_centroids, emb, k, iters):
    c = init_centroids.copy()
    for _ in range(iters):
        a = (emb @ c.T).argmax(1)                 # E step
        for j in range(k):                        # M step
            rows = emb[a == j]
            if len(rows) > 0:
                c[j] = rows.mean(0)
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return c, (emb @ c.T).argmax(1)               # final E step


def test_kmeans_matches_numpy_oracle(rng_np):
    n, d, k = 64, 16, 5
    emb = rng_np.normal(size=(n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    rng = jax.random.key(0)
    cents, assign = spherical_kmeans(rng, jnp.asarray(emb), k, iters=10)

    # replicate the init (randperm[:k]) with the same key
    perm = np.asarray(jax.random.permutation(rng, n))
    init = emb[perm[:k]].astype(np.float64)
    want_c, want_a = numpy_kmeans(init, emb.astype(np.float64), k, 10)

    np.testing.assert_allclose(np.asarray(cents), want_c, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(assign), want_a)
    # centroids are unit-norm (the per-iteration renorm, mlc_train.py:177)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(cents), axis=1), 1.0, rtol=1e-5)


def test_kmeans_deterministic(rng_np):
    emb = jnp.asarray(rng_np.normal(size=(32, 8)).astype(np.float32))
    c1, a1 = spherical_kmeans(jax.random.key(3), emb, 4)
    c2, a2 = spherical_kmeans(jax.random.key(3), emb, 4)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_scatter_assignments():
    a = jnp.asarray([1, 0, 2], dtype=jnp.int32)
    idx = jnp.asarray([5, 0, 2], dtype=jnp.int32)
    out = np.asarray(scatter_assignments(a, idx, total=8))
    want = np.full(8, -100)
    want[5], want[0], want[2] = 1, 0, 2
    np.testing.assert_array_equal(out, want)
