"""Serving predictor: bucketed batching, padding-trim, chunking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sm3x.models.mlc import MLCModel
from sm3x.serve import Predictor


@pytest.fixture(scope="module")
def predictor():
    model = MLCModel(arch="resnet18", proj_dim=32, sa_dim_ff=16,
                     use_prototype_bias=True, dtype=jnp.float32)
    d = jnp.zeros((1, 48, 48, 3), jnp.float32)
    variables = jax.jit(
        lambda r: model.init({"params": r, "dropout": r}, d, d))(jax.random.key(0))
    return Predictor(model, variables, mean=(0.5,) * 3, std=(0.25,) * 3,
                     test_sz=48, buckets=(1, 4), canvas=64)


def _imgs(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (rng.integers(40, 80), rng.integers(40, 80), 3),
                         dtype=np.uint8) for _ in range(n)]


def test_predict_shapes_and_probs(predictor):
    out = predictor.predict(_imgs(3), _imgs(3, 1))
    assert len(out) == 8
    assert out[0].shape == (3, 5)
    for p in out:
        np.testing.assert_allclose(p.sum(axis=-1), 1.0, rtol=1e-4)


def test_padding_does_not_change_results(predictor):
    d = _imgs(2, 2)
    c = _imgs(2, 3)
    out2 = predictor.predict(d, c)                    # bucket 4, padded
    out1 = [predictor.predict([d[i]], [c[i]]) for i in range(2)]  # bucket 1
    for h in range(8):
        np.testing.assert_allclose(
            out2[h][0], out1[0][h][0], rtol=2e-3, atol=2e-4)


def test_chunking_large_requests(predictor):
    out = predictor.predict(_imgs(7, 4), _imgs(7, 5))
    assert out[0].shape == (7, 5)


def _b64_jpeg(img: np.ndarray) -> str:
    import base64
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode()


def test_http_server_roundtrip(predictor):
    """POST /predict with base64 JPEG pairs -> per-label probabilities;
    /healthz and /labels respond; malformed requests get 400."""
    import json
    import urllib.request

    from sm3x.serve_http import PredictionServer

    server = PredictionServer(predictor, host="127.0.0.1", port=0).start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"
        with urllib.request.urlopen(f"{base}/labels", timeout=30) as r:
            labels = json.load(r)
        assert labels["labels"][0] == "DIAG" and labels["num_classes"][0] == 5

        imgs = _imgs(2, 7)
        body = json.dumps({"cases": [
            {"derm": _b64_jpeg(imgs[0]), "clinic": _b64_jpeg(imgs[1])},
            {"derm": _b64_jpeg(imgs[1]), "clinic": _b64_jpeg(imgs[0])},
        ]}).encode()
        req = urllib.request.Request(
            f"{base}/predict", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            preds = json.load(r)["predictions"]
        assert len(preds) == 2
        for case in preds:
            assert set(case) == {"BWV", "DaG", "PIG", "PN", "RS", "STR",
                                 "VS", "DIAG"}
            for probs in case.values():
                np.testing.assert_allclose(sum(probs), 1.0, rtol=1e-3)

        bad = urllib.request.Request(
            f"{base}/predict", data=b'{"cases": [{"derm": "!!"}]}',
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.stop()


def test_serving_applies_training_border_crop(predictor):
    """Request images get the SAME preprocessing as every training/eval
    image: the 25px black-border crop before letterbox (train/serve skew
    otherwise — reference datasets.py:377-379 crops unconditionally)."""
    img = np.zeros((120, 100, 3), np.uint8)
    _, hw = predictor._canvases([img])
    # cropped to 70x50, letterboxed into the 64-canvas
    assert tuple(hw[0]) == (64, round(50 * 64 / 70))
    # tiny images (no interior left) are not cropped
    tiny = np.zeros((40, 40, 3), np.uint8)
    _, hw = predictor._canvases([tiny])
    assert tuple(hw[0]) == (40, 40)
    # crop_amount=0 disables
    from sm3x.serve import Predictor

    p0 = Predictor(predictor.model, predictor.variables,
                   mean=(0.5,) * 3, std=(0.25,) * 3, test_sz=48,
                   buckets=(1,), canvas=64, crop_amount=0)
    _, hw = p0._canvases([img])
    assert tuple(hw[0]) == (64, round(100 * 64 / 120))


def test_empty_batch_returns_empty(predictor):
    out = predictor.predict([], [])
    assert len(out) == 8 and all(p.shape[0] == 0 for p in out)


def test_from_checkpoint_msgpack(tmp_path):
    """Predictor.from_checkpoint loads an sm3x msgpack via sm3x.api
    (the sm3x-serve bootstrap path) and serves predictions."""
    import os

    from sm3x.api import build_evaluator
    from sm3x.utils.checkpoint import save_checkpoint

    model = build_evaluator(arch="resnet18", mlc_proj_dim=32, sa_dim_ff=16,
                            dtype=jnp.float32)
    d = jnp.zeros((1, 48, 48, 3), jnp.float32)
    variables = jax.jit(
        lambda r: model.init({"params": r, "dropout": r}, d, d))(jax.random.key(1))
    ckpt = os.path.join(tmp_path, "best.msgpack")
    save_checkpoint(ckpt, {"params": variables["params"],
                           "batch_stats": variables.get("batch_stats", {})})

    p = Predictor.from_checkpoint(
        ckpt, arch="resnet18", mean=(0.5,) * 3, std=(0.25,) * 3,
        test_sz=48, buckets=(1, 2), canvas=64, mlc_proj_dim=32, sa_dim_ff=16)
    out = p.predict(_imgs(1, 11), _imgs(1, 12))
    assert out[0].shape == (1, 5)
    np.testing.assert_allclose(out[0].sum(axis=-1), 1.0, rtol=1e-4)


def test_http_server_concurrent_requests(predictor):
    """Parallel /predict requests on the --no-batching path serialize
    behind the dispatch lock and all succeed (the batching path is
    covered by test_http_batching_coalesces_distinct_requests)."""
    import base64
    import concurrent.futures
    import json
    import urllib.request

    from sm3x.serve_http import PredictionServer

    server = PredictionServer(predictor, host="127.0.0.1", port=0,
                              batching=False).start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        imgs = _imgs(2, 21)
        body = json.dumps({"cases": [
            {"derm": _b64_jpeg(imgs[0]), "clinic": _b64_jpeg(imgs[1])}]}).encode()

        def one(_):
            req = urllib.request.Request(
                f"{base}/predict", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.load(r)["predictions"]

        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            results = list(ex.map(one, range(4)))
        assert len(results) == 4
        first = results[0][0]["DIAG"]
        for r in results[1:]:
            np.testing.assert_allclose(r[0]["DIAG"], first, rtol=1e-5)
    finally:
        server.stop()


def test_http_body_size_cap(predictor):
    """Oversized /predict bodies are rejected with 413 before any decode
    (ADVICE round 1: unbounded reads could exhaust host memory)."""
    import json
    import urllib.request

    from sm3x.serve_http import PredictionServer

    server = PredictionServer(predictor, host="127.0.0.1", port=0,
                              max_body_mb=0.001).start()  # 1 KiB cap
    base = f"http://127.0.0.1:{server.port}"
    try:
        body = json.dumps({"cases": [{"derm": "x" * 4096,
                                      "clinic": "x" * 4096}]}).encode()
        req = urllib.request.Request(
            f"{base}/predict", data=body,
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 413"
        except urllib.error.HTTPError as e:
            assert e.code == 413
    finally:
        server.stop()


def test_batcher_stop_fails_pending_requests(predictor):
    """Requests that race _Batcher.stop()'s sentinel are failed with an
    error instead of blocking their handler threads forever (ADVICE
    round 1). New requests after stop are rejected immediately."""
    import queue
    import threading

    from sm3x.serve_http import _Batcher

    class SlowPredictor:
        def predict(self, derm, clinic):
            import time

            time.sleep(0.3)
            return [np.zeros((len(derm), 5), np.float32)] * 8

    b = _Batcher(SlowPredictor(), max_batch=1, max_wait_ms=1.0)
    errors: "queue.Queue" = queue.Queue()

    def blocked_request():
        try:
            b.predict([np.zeros((8, 8, 3), np.uint8)],
                      [np.zeros((8, 8, 3), np.uint8)])
            errors.put(None)
        except RuntimeError as e:
            errors.put(str(e))

    # occupy the loop with a slow dispatch, then queue one more request
    # plus the stop sentinel so the second request races the shutdown
    t1 = threading.Thread(target=blocked_request)
    t1.start()
    import time

    time.sleep(0.1)  # let the first dispatch start
    done = threading.Event()
    slot: dict = {}
    b.q.put(([np.zeros((8, 8, 3), np.uint8)],
             [np.zeros((8, 8, 3), np.uint8)], done, slot))
    b._stopped = True
    b.q.put(b._SENTINEL)
    t1.join(timeout=10)
    b._thread.join(timeout=10)
    b._fail_pending("server stopped")
    assert done.wait(timeout=5), "pending request was never released"
    # the raced request either got served (it beat the sentinel) or errored
    assert ("probs" in slot) or ("error" in slot)
    # a request arriving after stop is rejected immediately
    try:
        b.predict([np.zeros((8, 8, 3), np.uint8)],
                  [np.zeros((8, 8, 3), np.uint8)])
        assert False, "expected rejection after stop"
    except RuntimeError:
        pass


def test_http_batching_coalesces_distinct_requests(predictor):
    """Dynamic batching: concurrent requests with DIFFERENT images each
    get THEIR OWN predictions (slicing of the coalesced batch), matching
    a direct Predictor call."""
    import concurrent.futures
    import json
    import urllib.request

    from sm3x.serve_http import PredictionServer

    server = PredictionServer(predictor, host="127.0.0.1", port=0,
                              batching=True, max_batch=8,
                              max_wait_ms=100).start()
    base = f"http://127.0.0.1:{server.port}"
    derms = _imgs(3, 31)
    clinics = _imgs(3, 32)
    direct = predictor.predict(derms, clinics)
    try:
        def one(i):
            body = json.dumps({"cases": [
                {"derm": _b64_jpeg(derms[i]), "clinic": _b64_jpeg(clinics[i])},
            ]}).encode()
            req = urllib.request.Request(
                f"{base}/predict", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.load(r)["predictions"][0]

        with concurrent.futures.ThreadPoolExecutor(3) as ex:
            results = list(ex.map(one, range(3)))
        for i, case in enumerate(results):
            # JPEG re-encode + batch-composition fp noise only
            np.testing.assert_allclose(case["DIAG"], direct[0][i],
                                       rtol=0.1, atol=0.03)
        # the three requests must NOT all share one prediction
        assert not np.allclose(results[0]["DIAG"], results[1]["DIAG"],
                               atol=1e-6) or not np.allclose(
            results[1]["DIAG"], results[2]["DIAG"], atol=1e-6)
    finally:
        server.stop()
