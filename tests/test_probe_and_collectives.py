"""Linear probe + collective helpers + KNN evaluator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sm3x.models.evaluator import knn_predict
from sm3x.parallel.collectives import all_gather_varlen


def test_knn_predict_simple():
    # bank: two tight clusters; queries must vote for the nearest cluster
    bank = jnp.asarray(np.vstack([
        np.tile([1.0, 0.0], (5, 1)) + 0.01 * np.random.default_rng(0).normal(size=(5, 2)),
        np.tile([0.0, 1.0], (5, 1)) + 0.01 * np.random.default_rng(1).normal(size=(5, 2)),
    ]).astype(np.float32))
    bank = bank / jnp.linalg.norm(bank, axis=1, keepdims=True)
    bank_y = jnp.asarray([0] * 5 + [1] * 5, dtype=jnp.int32)
    q = jnp.asarray([[1.0, 0.05], [0.05, 1.0]], jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    scores = knn_predict(q, bank, bank_y, num_classes=2, k=5)
    assert scores.shape == (2, 2)
    assert int(jnp.argmax(scores[0])) == 0
    assert int(jnp.argmax(scores[1])) == 1


def test_all_gather_varlen_shard_map():
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devs = jax.devices()[:4]
    mesh = Mesh(np.asarray(devs), ("data",))
    x = jnp.arange(4 * 3, dtype=jnp.float32).reshape(4, 3)

    def body(xs):
        gathered, lengths = all_gather_varlen(xs, "data", max_len=1)
        return gathered, lengths

    fn = shard_map(body, mesh=mesh, in_specs=P("data"),
                   out_specs=(P(), P()), check_vma=False)
    gathered, lengths = fn(x)
    assert gathered.shape == (4, 1, 3)
    np.testing.assert_array_equal(np.asarray(lengths), [1, 1, 1, 1])
    np.testing.assert_allclose(np.asarray(gathered[:, 0]), np.asarray(x))


def test_linear_probe_learns(tmp_path):
    """Probe separable random features -> AUC above chance after a few epochs."""
    from sm3x.train.linear_probe import LinearProbe
    from sm3x.data.pipeline import Batch

    rng = np.random.default_rng(0)
    n, d = 64, 16
    w_true = rng.normal(size=(d, 8))

    class FeatData:
        n_items = n

        def __init__(self):
            self.feats = rng.normal(size=(n, d)).astype(np.float32)
            margins = self.feats @ w_true
            self.labels = (margins[:, :8] > 0).astype(np.int32)
            self.n = n

        def batches(self, bs, epoch=0, seed=0, shuffle=True):
            idx = np.arange(self.n)
            if shuffle:
                np.random.default_rng(seed + epoch).shuffle(idx)
            for s in range(0, self.n, bs):
                sel = idx[s:s + bs]
                mask = np.ones(len(sel), bool)
                if len(sel) < bs:
                    padn = bs - len(sel)
                    sel = np.concatenate([sel, idx[:padn]])
                    mask = np.concatenate([mask, np.zeros(padn, bool)])
                yield Batch(derm=self.feats[sel], derm_hw=None, clinic=None,
                            clinic_hw=None, label=self.labels[sel],
                            index=sel.astype(np.int32), mask=mask)

    data = FeatData()
    probe = LinearProbe(d, ft_lr=5e-2, num_classes=(2,) * 8, seed=0)

    def extract(batch, rng_, train):
        return jnp.asarray(batch.derm)

    best = probe.run(extract, data, data, batch_size=16, epochs=5,
                     label_weights=(1.0,) * 8)
    assert best["AUC_AVG"] > 0.8


def test_host_gather_tree_matches_leafwise():
    """host_gather_tree must be value-identical to leaf-by-leaf
    host_gather (it only batches the device->host copies, BENCH.md
    round 5), preserve tree structure, and return numpy arrays."""
    from sm3x.parallel import host_gather, host_gather_tree

    tree = {
        "preds": [jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                  jnp.ones((4,), jnp.bfloat16)],
        "labels": (jnp.asarray([1, 0, 2], jnp.int32),),
    }
    out = host_gather_tree(tree)
    ref = jax.tree.map(host_gather, tree)
    assert jax.tree.structure(out) == jax.tree.structure(ref)
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
        assert isinstance(a, np.ndarray)
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
