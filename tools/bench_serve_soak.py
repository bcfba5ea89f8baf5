#!/usr/bin/env python
"""HTTP serving soak at the RELEASED model shape (VERDICT r4 weak #5).

Round 1 measured the burst-coalescing ratio and the sustained HTTP soak
with a ResNet-18@48 surrogate; this tool re-runs that protocol
(tests/isolated/test_serve.py's burst + soak shapes) with the actual
released architecture — dual ResNet-50 @224, mlc_proj_dim 512,
sa_dim_ff 128 (inference.py:8-13 constants) — over the real chip.

    python tools/bench_serve_soak.py [--requests 200] [--clients 16]

Prints one JSON line: burst-coalesced vs serialized ms, soak cases/s.
"""

import argparse
import base64
import concurrent.futures
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _b64_jpeg(img: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="resnet50")
    p.add_argument("--test-sz", type=int, default=224)
    p.add_argument("--canvas", type=int, default=320)
    p.add_argument("--mlc-proj-dim", type=int, default=512)
    p.add_argument("--sa-dim-ff", type=int, default=128)
    p.add_argument("--requests", type=int, default=200)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--burst", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sm3x.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from sm3x.models.mlc import MLCModel
    from sm3x.serve import Predictor
    from sm3x.serve_http import PredictionServer

    model = MLCModel(arch=args.arch, proj_dim=args.mlc_proj_dim,
                     sa_dim_ff=args.sa_dim_ff, use_prototype_bias=True,
                     dtype=jnp.bfloat16)
    d = jnp.zeros((1, args.test_sz, args.test_sz, 3), jnp.float32)
    variables = jax.jit(
        lambda r: model.init({"params": r, "dropout": r}, d, d))(
            jax.random.key(0))
    predictor = Predictor(model, variables,
                          mean=(0.7833, 0.6712, 0.6026),
                          std=(0.2139, 0.2472, 0.2571),
                          test_sz=args.test_sz, canvas=args.canvas,
                          buckets=(1, 4, 8, 16))

    rng = np.random.default_rng(0)

    def img():
        h, w = rng.integers(400, 600), rng.integers(400, 600)
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    # warm every bucket's compile BEFORE timing
    for b in (1, 4, 8, 16):
        predictor.predict([img() for _ in range(b)],
                          [img() for _ in range(b)])

    server = PredictionServer(predictor, host="127.0.0.1", port=0,
                              batching=True, max_batch=16,
                              max_wait_ms=20).start()
    base = f"http://127.0.0.1:{server.port}"
    import urllib.request

    def one_request(_):
        body = json.dumps({"cases": [
            {"derm": _b64_jpeg(img()), "clinic": _b64_jpeg(img())}]}).encode()
        req = urllib.request.Request(
            f"{base}/predict", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.load(r)["predictions"]

    try:
        one_request(0)  # HTTP-path warmup

        # burst: N concurrent single-case requests coalesced by the
        # dynamic batcher vs the same N dispatched one-by-one
        t0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(args.burst) as ex:
            list(ex.map(one_request, range(args.burst)))
        burst_ms = (time.perf_counter() - t0) * 1000.0
        t0 = time.perf_counter()
        for i in range(args.burst):
            one_request(i)
        serial_ms = (time.perf_counter() - t0) * 1000.0

        # sustained soak
        t0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(args.clients) as ex:
            list(ex.map(one_request, range(args.requests)))
        soak_s = time.perf_counter() - t0
    finally:
        server.stop()

    print(json.dumps({
        "metric": "serve_soak_cases_per_sec",
        "arch": args.arch, "test_sz": args.test_sz,
        "mlc_proj_dim": args.mlc_proj_dim, "sa_dim_ff": args.sa_dim_ff,
        "value": round(args.requests / soak_s, 2),
        "requests": args.requests, "clients": args.clients,
        "burst_n": args.burst,
        "burst_coalesced_ms": round(burst_ms, 1),
        "burst_serialized_ms": round(serial_ms, 1),
        "coalescing_ratio": round(serial_ms / burst_ms, 2),
    }))


if __name__ == "__main__":
    main()
