#!/usr/bin/env python
"""Measure int8 vs bf16 MXU matmul throughput on this chip.

BENCH.md's speed-of-light argument names lower-precision activations
(int8) as the one remaining headroom lever the recipe doesn't sanction;
this quantifies what it would buy. v5e advertises 2x int8 MXU
throughput over bf16 (394 vs 197 T[O/FL]OPS peak).

Usage: python tools/bench_int8_mxu.py [n] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    from sm3x.core.cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)

    def timed(a, b, acc, tag):
        @jax.jit
        def loop(a, b):
            def body(c, _):
                # perturb `a` by the carry so the matmul cannot hoist
                o = jax.lax.dot_general(
                    a + c.astype(a.dtype), b,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=acc)
                # carry depends on EVERY output element so XLA cannot
                # narrow the matmul to a slice (o[0,0] alone lets the
                # simplifier reduce it to one dot product — measured
                # 1155 "TFLOPS", 5x over the chip's physical peak)
                return c + (jnp.sum(o) != 0).astype(jnp.int32), None
            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return c
        float(loop(a, b))
        t0 = time.perf_counter()
        float(loop(a, b))
        dt = (time.perf_counter() - t0) / iters
        ops = 2 * n ** 3 / dt / 1e12
        print(f"{tag}: {ops:,.1f} T(FL)OPS  ({dt * 1e3:.2f} ms per {n}^3)")
        return ops

    a8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    abf = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    bf = timed(abf, bbf, jnp.float32, f"bf16 {n}^3 matmul")
    i8 = timed(a8, b8, jnp.int32, f"int8 {n}^3 matmul")
    print(f"int8/bf16: {i8 / bf:.2f}x")


if __name__ == "__main__":
    main()
