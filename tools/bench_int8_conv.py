#!/usr/bin/env python
"""Measure int8 vs bf16 convolution throughput at ResNet-50 shapes.

bench_int8_mxu.py established int8 matmuls reach 260 TOPS (1.65x bf16)
on this chip; this probes whether XLA lowers *convolutions* with int8
operands + int32 accumulation onto the same MXU fast path — the go/no-go
for an int8 post-training-quantized serving backbone (the inference-side
lever named in BENCH.md's round-2 conclusion).

Shapes are the four dominant Bottleneck convs of ResNet-50 at batch 128
(NHWC). Hoist-proof in-jit scan per BENCH.md methodology.

Usage: python tools/bench_int8_conv.py [batch] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


# (H, W, Cin, Cout, kernel, stride) — one representative conv per stage
SHAPES = [
    (56, 56, 64, 64, 3, 1),
    (28, 28, 128, 128, 3, 1),
    (14, 14, 256, 256, 3, 1),
    (7, 7, 512, 512, 3, 1),
    (56, 56, 256, 64, 1, 1),    # bottleneck 1x1 reduce
    (14, 14, 1024, 256, 1, 1),
]


def conv_flops(b, h, w, cin, cout, k, s):
    return 2 * b * (h // s) * (w // s) * cin * cout * k * k


def timed_conv(x, w, acc, stride, iters, tag, flops):
    @jax.jit
    def loop(x, w):
        def body(c, _):
            xx = x + c.astype(x.dtype)  # carry-dependent: no hoisting
            o = jax.lax.conv_general_dilated(
                xx, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc)
            return c + (jnp.sum(o) != 0).astype(jnp.int32), None
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return c

    try:
        float(loop(x, w))
    except Exception as e:  # noqa: BLE001 - report unsupported lowering
        print(f"{tag}: FAILED ({type(e).__name__}: {str(e)[:120]})")
        return None
    t0 = time.perf_counter()
    float(loop(x, w))
    dt = (time.perf_counter() - t0) / iters
    tput = flops / dt / 1e12
    print(f"{tag}: {tput:7.1f} T(FL)OPS  ({dt * 1e3:.2f} ms)")
    return tput


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from sm3x.core.cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    ratios = []
    for (h, w, cin, cout, k, s) in SHAPES:
        flops = conv_flops(batch, h, w, cin, cout, k, s)
        xb = jnp.asarray(rng.standard_normal((batch, h, w, cin)), jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((k, k, cin, cout)), jnp.bfloat16)
        x8 = jnp.asarray(rng.integers(-127, 127, (batch, h, w, cin)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 127, (k, k, cin, cout)), jnp.int8)
        name = f"{h}x{w}x{cin}->{cout} k{k}s{s}"
        bf = timed_conv(xb, wb, jnp.float32, s, iters, f"bf16 {name}", flops)
        i8 = timed_conv(x8, w8, jnp.int32, s, iters, f"int8 {name}", flops)
        if bf and i8:
            ratios.append(i8 / bf)
            print(f"  -> int8/bf16 {i8 / bf:.2f}x")
    if ratios:
        print(f"geomean int8/bf16 over {len(ratios)} shapes: "
              f"{float(np.exp(np.mean(np.log(ratios)))):.2f}x")


if __name__ == "__main__":
    main()
