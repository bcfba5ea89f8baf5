#!/usr/bin/env python
"""Re-measure the platform's Pallas vs XLA HBM streaming bandwidth.

Round 1 measured Pallas block IO capped at ~270 GB/s on this (tunneled
axon v5e) platform while XLA elementwise streams hit ~1.4 TB/s — the
measurement that killed VMEM-fused conv blocks (BENCH.md). This tool
re-checks that cap so the verdict can be revisited whenever the platform
updates: an identity-copy pallas_call vs an XLA elementwise op over the
same array, timed hoist-proof (the kernel output carries into the next
iteration through lax.scan) and synced with a value read.

Usage: python tools/bench_pallas_io.py [mib] [iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from sm3x.core.cache import enable_compilation_cache

    enable_compilation_cache()

    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    rows = mib * 1024 * 1024 // (4 * 1024)  # f32, 1024-wide
    x = jnp.ones((rows, 1024), jnp.float32)
    nbytes = x.size * 4

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    block = 512

    def pallas_copy(v):
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            grid=(rows // block,),
            in_specs=[pl.BlockSpec((block, 1024), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((block, 1024), lambda i: (i, 0)),
        )(v)

    @jax.jit
    def run_pallas(v):
        return jax.lax.scan(lambda c, _: (pallas_copy(c), 0.0),
                            v, None, length=iters)[0]

    @jax.jit
    def run_xla(v):
        return jax.lax.scan(lambda c, _: (c + 1.0, 0.0),
                            v, None, length=iters)[0]

    for name, fn in (("pallas_identity_copy", run_pallas),
                     ("xla_elementwise", run_xla)):
        out = fn(x)
        float(out[0, 0])  # warmup + sync (block_until_ready lies on axon)
        t0 = time.perf_counter()
        out = fn(x)
        float(out[0, 0])
        dt = time.perf_counter() - t0
        gbps = 2 * nbytes * iters / dt / 1e9  # read + write per iteration
        print(json.dumps({"metric": f"{name}_gbytes_per_sec",
                          "value": round(gbps, 1),
                          "unit": f"GB/s ({mib} MiB array, {iters} chained "
                                  f"iterations)"}), flush=True)


if __name__ == "__main__":
    main()
