#!/usr/bin/env python
"""Probe: do subsampled train-BN statistics buy forward throughput?

BENCH.md round 1: train-mode BN stats cost +41% of forward — the stat
reduction is a second full read of every conv output (eval-mode BN fuses
into the conv epilogue). The untried lever is computing batch statistics
from a contiguous slice of the batch (x[:B//k]): the stat pass then reads
1/k of the activations (contiguous rows — DMA-friendly), while the
normalize pass is unchanged. Statistically, mean/var per channel still
average over B/k * H * W samples (tens of thousands at SSL shapes), the
ghost-batch-norm regime common in large-batch training.

This probe monkeypatches nothing: it builds two ResNet-50 forwards, one
with standard flax BN and one whose stats are computed from the slice,
and times both with the hoist-proof in-jit scan methodology from
BENCH.md. If the slice variant is not measurably faster, the idea is
dead (XLA fused the stat read somewhere we cannot see) — record and
stop.

Usage: python tools/bench_bn_subsample.py [batch] [iters] [k]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from sm3x.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from sm3x.models.resnet import build_resnet

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 224, 224, 3)), jnp.bfloat16)

    def timed(fn, tree, tag):
        # scan over iters inside one jit; carry a scalar so nothing
        # hoists. The variable tree is an ARGUMENT (closing over device
        # arrays embeds them as mlir constants -> device reads at trace
        # time, which the tunnel refuses).
        @jax.jit
        def loop(tree, x):
            def body(c, _):
                out = fn(tree, x + c.astype(jnp.bfloat16) * 0)
                return c + out.mean().astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c
        float(loop(tree, x))  # compile + warm
        t0 = time.perf_counter()
        v = float(loop(tree, x))
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: {batch / dt:,.0f} img/s  ({dt * 1e3:.1f} ms)  [{v:.3f}]")
        return batch / dt

    model = build_resnet("resnet50", dtype=jnp.bfloat16)
    v0 = model.init(jax.random.PRNGKey(0), x[:2], True)

    def fwd_std(tree, xx):
        out, _ = model.apply(tree, xx, True, mutable=["batch_stats"])
        return out

    base = timed(fwd_std, v0, f"train-BN fwd, standard stats      (b={batch})")

    sub = int(os.environ.get("SM3X_BN_STAT_SUBSAMPLE", str(k)))
    os.environ["SM3X_BN_STAT_SUBSAMPLE"] = str(sub)
    try:
        from sm3x.models import resnet as _r
        if not hasattr(_r, "SUBSAMPLE_PROBE"):
            # inline variant: identical math except stats from x[:n//k]
            import flax.linen as nn

            class SubStatBN(nn.Module):
                momentum: float = 0.9
                epsilon: float = 1e-5
                dtype: object = jnp.bfloat16
                k: int = 4

                @nn.compact
                def __call__(self, x):
                    feat = x.shape[-1]
                    scale = self.param("scale", nn.initializers.ones, (feat,),
                                       jnp.float32)
                    bias = self.param("bias", nn.initializers.zeros, (feat,),
                                      jnp.float32)
                    n = max(1, x.shape[0] // self.k)
                    xs = x[:n].astype(jnp.float32)
                    mean = xs.mean(axis=(0, 1, 2))
                    var = (xs * xs).mean(axis=(0, 1, 2)) - mean * mean
                    inv = jax.lax.rsqrt(var + self.epsilon) * scale
                    y = (x.astype(jnp.float32) - mean) * inv + bias
                    return y.astype(self.dtype)

            def make_fwd_sub():
                import flax.linen as fnn

                class ConvSub(fnn.Module):
                    features: int
                    kernel: tuple
                    strides: int = 1
                    k: int = 4

                    @fnn.compact
                    def __call__(self, x):
                        x = fnn.Conv(self.features, self.kernel,
                                     strides=self.strides,
                                     padding=[(kk // 2, kk // 2)
                                              for kk in self.kernel],
                                     use_bias=False, dtype=jnp.bfloat16,
                                     param_dtype=jnp.float32)(x)
                        return SubStatBN(k=self.k)(x)

                # full ResNet-50 with SubStatBN in place of flax BN
                class Bottle(fnn.Module):
                    planes: int
                    strides: int = 1
                    downsample: bool = False
                    k: int = 4

                    @fnn.compact
                    def __call__(self, x):
                        identity = x
                        out = fnn.relu(ConvSub(self.planes, (1, 1), k=self.k)(x))
                        out = fnn.relu(ConvSub(self.planes, (3, 3),
                                               self.strides, k=self.k)(out))
                        out = ConvSub(self.planes * 4, (1, 1), k=self.k)(out)
                        if self.downsample:
                            identity = ConvSub(self.planes * 4, (1, 1),
                                               self.strides, k=self.k)(x)
                        return fnn.relu(out + identity)

                class Net(fnn.Module):
                    k: int = 4

                    @fnn.compact
                    def __call__(self, x):
                        x = fnn.Conv(64, (7, 7), strides=2,
                                     padding=[(3, 3), (3, 3)], use_bias=False,
                                     dtype=jnp.bfloat16,
                                     param_dtype=jnp.float32)(x)
                        x = fnn.relu(SubStatBN(k=self.k)(x))
                        x = fnn.max_pool(x, (3, 3), strides=(2, 2),
                                         padding=[(1, 1), (1, 1)])
                        planes = 64
                        for stage, n_blocks in enumerate((3, 4, 6, 3)):
                            for i in range(n_blocks):
                                strides = 2 if (stage > 0 and i == 0) else 1
                                down = i == 0
                                x = Bottle(planes=planes, strides=strides,
                                           downsample=down, k=self.k)(x)
                            planes *= 2
                        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)

                net = Net(k=sub)
                vs = net.init(jax.random.PRNGKey(0), x[:2])

                def fwd(tree, xx):
                    return net.apply(tree, xx)

                return fwd, vs

            fwd_sub, vs_sub = make_fwd_sub()
            r = timed(fwd_sub, vs_sub,
                      f"train-BN fwd, stats from B/{sub} slice")
            print(f"speedup: {r / base:.3f}x")
    finally:
        pass


if __name__ == "__main__":
    main()
