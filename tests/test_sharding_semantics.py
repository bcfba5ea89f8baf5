"""Sharded-jit semantics: global-batch BN (SyncBN parity) and grouped
NT-Xent shard alignment on the 8-virtual-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from sm3x.core.mesh import make_mesh, shard_batch, replicate
from sm3x.models.resnet import build_resnet
from sm3x.ops.ntxent import grouped_ntxent_loss


def test_batchnorm_stats_are_global_batch():
    """A data-sharded jit must compute train-mode BN statistics over the
    GLOBAL batch — the reference's SyncBN (backbone_train.py:510) falling
    out of GSPMD. Per-shard statistics would differ wildly; only float
    reduction-order noise is allowed."""
    import flax.linen as nn

    mesh = make_mesh()
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    x = jnp.asarray(np.random.default_rng(0).normal(
        loc=3.0, scale=2.0, size=(64, 16)), jnp.float32)
    variables = bn.init(jax.random.key(0), x)

    @jax.jit
    def fwd(v, x):
        out, mut = bn.apply(v, x, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    out_plain, stats_plain = fwd(variables, x)
    v_sharded = {
        "params": replicate(mesh, variables["params"]),
        "batch_stats": replicate(mesh, variables["batch_stats"]),
    }
    x_sharded = shard_batch(mesh, {"x": x})["x"]
    out_shard, stats_shard = fwd(v_sharded, x_sharded)

    np.testing.assert_allclose(np.asarray(out_shard), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(stats_plain)),
                    jax.tree.leaves(jax.device_get(stats_shard))):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_resnet_sharded_forward_close():
    """Deep-net sharded vs unsharded forward agrees up to reduction-order
    noise compounded through 16 BN layers (loose tolerance, but per-shard
    BN would be wildly off)."""
    mesh = make_mesh()
    model = build_resnet("resnet18", dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 32, 32, 3)),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)

    @jax.jit
    def fwd(v, x):
        out, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
        return out

    out_plain = np.asarray(fwd(variables, x))
    v_sharded = {
        "params": replicate(mesh, variables["params"]),
        "batch_stats": replicate(mesh, variables["batch_stats"]),
    }
    out_shard = np.asarray(fwd(v_sharded, shard_batch(mesh, {"x": x})["x"]))
    err = np.abs(out_shard - out_plain) / (np.abs(out_plain) + 1e-3)
    assert np.median(err) < 1e-4
    assert err.max() < 0.2


def test_grouped_ntxent_under_sharding():
    """grouped loss value is identical whether z is sharded or not."""
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    z1 = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    z2 = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)

    fn = jax.jit(lambda a, b: grouped_ntxent_loss(a, b, 0.1, groups=8))
    want = float(fn(z1, z2))
    sb = shard_batch(mesh, {"z1": z1, "z2": z2})
    got = float(fn(sb["z1"], sb["z2"]))
    np.testing.assert_allclose(got, want, rtol=1e-5)
