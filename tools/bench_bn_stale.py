#!/usr/bin/env python
"""Probe: one-pass BN via previous-step ("stale") statistics.

BENCH.md: train-mode BN stats cost +41% of forward because the
normalization depends on the current batch reduction — XLA must
materialize every conv output, reduce it, then re-read it to normalize
(two full passes), where eval-mode BN fuses into the conv epilogue.

The untried structural fix: normalize with the *running* statistics
(constants w.r.t. the current batch, exactly eval-BN math) while still
computing current-batch statistics only to advance the EMA. The stat
reduction then has no consumer on the normalize path, so XLA is free to
fuse it into the same pass that produces the conv output — if it does,
train-mode forward approaches eval-mode cost. Backward also cheapens:
stats are non-differentiated constants, so the dx term loses the
batch-correlation reductions.

Semantics: this is not reference BN (one-step-stale statistics, known in
the literature as online/lagged BN; EMA warmup matters early). The probe
only answers whether the fusion materializes on this platform; wiring a
flag is only worth it if the measured win is real.

Usage: python tools/bench_bn_stale.py [batch] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


class StaleBN(nn.Module):
    """Normalize with running stats (eval-BN math); update the EMA from
    current-batch statistics computed in the same call. `stats` live in
    their own collection and are never differentiated."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        r_mean = self.variable("stats", "mean",
                               lambda: jnp.zeros((feat,), jnp.float32))
        r_var = self.variable("stats", "var",
                              lambda: jnp.ones((feat,), jnp.float32))
        mu = jax.lax.stop_gradient(r_mean.value)
        var = jax.lax.stop_gradient(r_var.value)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mu) * inv + bias
        if not self.is_initializing():
            xs = jax.lax.stop_gradient(x).astype(jnp.float32)
            b_mean = xs.mean(axis=(0, 1, 2))
            b_var = (xs * xs).mean(axis=(0, 1, 2)) - b_mean * b_mean
            m = self.momentum
            r_mean.value = m * r_mean.value + (1 - m) * b_mean
            r_var.value = m * r_var.value + (1 - m) * b_var
        return y.astype(self.dtype)


class _ConvBN(nn.Module):
    features: int
    kernel: tuple
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=[(k // 2, k // 2) for k in self.kernel],
                    use_bias=False, dtype=jnp.bfloat16,
                    param_dtype=jnp.float32)(x)
        return StaleBN()(x)


class _Bottleneck(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.relu(_ConvBN(self.planes, (1, 1))(x))
        out = nn.relu(_ConvBN(self.planes, (3, 3), self.strides)(out))
        out = _ConvBN(self.planes * 4, (1, 1))(out)
        if self.downsample:
            identity = _ConvBN(self.planes * 4, (1, 1), self.strides)(x)
        return nn.relu(out + identity)


class _StaleResNet50(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=jnp.bfloat16,
                    param_dtype=jnp.float32)(x)
        x = nn.relu(StaleBN()(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        planes = 64
        for stage, n_blocks in enumerate((3, 4, 6, 3)):
            for i in range(n_blocks):
                strides = 2 if (stage > 0 and i == 0) else 1
                x = _Bottleneck(planes=planes, strides=strides,
                                downsample=(i == 0))(x)
            planes *= 2
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from sm3x.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from sm3x.models.resnet import build_resnet

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 224, 224, 3)), jnp.bfloat16)

    def timed(step, tree, tag):
        # hoist-proof: the mutated stats collection is the scan carry, so
        # every iteration depends on the previous one.
        @jax.jit
        def loop(tree, x):
            def body(carry, _):
                c, aux = carry
                out, aux = step(tree, aux, x + c.astype(jnp.bfloat16) * 0)
                return (c + out, aux), None
            (c, _), _ = jax.lax.scan(
                body, (jnp.float32(0), tree.pop("aux")), None, length=iters)
            return c
        tree = dict(tree)
        float(loop(dict(tree), x))  # compile + warm
        t0 = time.perf_counter()
        v = float(loop(dict(tree), x))
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: {batch / dt:,.0f} img/s  ({dt * 1e3:.1f} ms)  [{v:.3f}]",
              flush=True)
        return batch / dt

    # ---- baseline: standard flax train-BN ----
    model = build_resnet("resnet50", dtype=jnp.bfloat16)
    v0 = model.init(jax.random.PRNGKey(0), x[:2], True)

    def std_fwd(tree, stats, xx):
        out, new = model.apply({"params": tree["params"], "batch_stats": stats},
                               xx, True, mutable=["batch_stats"])
        return out.mean().astype(jnp.float32), new["batch_stats"]

    def std_fwdbwd(tree, stats, xx):
        def loss_fn(p):
            out, new = model.apply({"params": p, "batch_stats": stats},
                                   xx, True, mutable=["batch_stats"])
            return out.mean().astype(jnp.float32), new["batch_stats"]
        (loss, new), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            tree["params"])
        gnorm = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                    for g in jax.tree.leaves(grads))
        return loss + 1e-12 * gnorm, new  # consume grads (no DCE)

    # ---- stale-BN variant ----
    net = _StaleResNet50()
    vs = net.init(jax.random.PRNGKey(0), x[:2])

    def stale_fwd(tree, stats, xx):
        out, new = net.apply({"params": tree["params"], "stats": stats},
                             xx, mutable=["stats"])
        return out.mean().astype(jnp.float32), new["stats"]

    def stale_fwdbwd(tree, stats, xx):
        def loss_fn(p):
            out, new = net.apply({"params": p, "stats": stats},
                                 xx, mutable=["stats"])
            return out.mean().astype(jnp.float32), new["stats"]
        (loss, new), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            tree["params"])
        gnorm = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                    for g in jax.tree.leaves(grads))
        return loss + 1e-12 * gnorm, new  # consume grads (no DCE)

    b_fwd = timed(std_fwd, {"params": v0["params"], "aux": v0["batch_stats"]},
                  f"fwd   train-BN standard (b={batch})")
    s_fwd = timed(stale_fwd, {"params": vs["params"], "aux": vs["stats"]},
                  f"fwd   stale-stats BN    (b={batch})")
    print(f"fwd speedup: {s_fwd / b_fwd:.3f}x", flush=True)

    b_bwd = timed(std_fwdbwd, {"params": v0["params"], "aux": v0["batch_stats"]},
                  f"fwd+bwd train-BN standard (b={batch})")
    s_bwd = timed(stale_fwdbwd, {"params": vs["params"], "aux": vs["stats"]},
                  f"fwd+bwd stale-stats BN    (b={batch})")
    print(f"fwd+bwd speedup: {s_bwd / b_bwd:.3f}x", flush=True)


if __name__ == "__main__":
    main()
