"""AOT export (jax.export): artifact roundtrip, parity with the live
Predictor, and model-code independence of the load path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sm3x.models.mlc import MLCModel
from sm3x.serve import Predictor
from sm3x.export import ExportedPredictor, export_predictor


@pytest.fixture(scope="module")
def model_and_vars():
    model = MLCModel(arch="resnet18", proj_dim=32, sa_dim_ff=16,
                     use_prototype_bias=True, dtype=jnp.float32)
    d = jnp.zeros((1, 48, 48, 3), jnp.float32)
    variables = jax.jit(
        lambda r: model.init({"params": r, "dropout": r}, d, d))(jax.random.key(0))
    return model, variables


@pytest.fixture(scope="module")
def artifact(model_and_vars, tmp_path_factory):
    model, variables = model_and_vars
    path = str(tmp_path_factory.mktemp("export") / "artifact")
    manifest = export_predictor(model, variables, path, buckets=(1, 4),
                                image_size=48, mean=(0.5,) * 3,
                                std=(0.25,) * 3, canvas=64)
    assert manifest["buckets"] == [1, 4]
    return path


def _imgs(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (rng.integers(40, 80), rng.integers(40, 80), 3),
                         dtype=np.uint8) for _ in range(n)]


def test_exported_matches_live_predictor(model_and_vars, artifact):
    model, variables = model_and_vars
    live = Predictor(model, variables, mean=(0.5,) * 3, std=(0.25,) * 3,
                     test_sz=48, buckets=(1, 4), canvas=64)
    exported = ExportedPredictor(artifact)
    d, c = _imgs(3, 1), _imgs(3, 2)
    out_live = live.predict(d, c)
    out_exp = exported.predict(d, c)
    assert len(out_exp) == 8 and out_exp[0].shape == (3, 5)
    for h in range(8):
        np.testing.assert_allclose(out_exp[h], out_live[h],
                                   rtol=1e-5, atol=1e-6)


def test_exported_chunks_and_pads(artifact):
    exported = ExportedPredictor(artifact)
    out = exported.predict(_imgs(6, 3), _imgs(6, 4))  # chunked through b=4
    assert out[0].shape == (6, 5)
    for p in out:
        np.testing.assert_allclose(p.sum(axis=-1), 1.0, rtol=1e-4)
    empty = exported.predict([], [])
    assert empty[0].shape == (0, 5)


def test_exported_runs_in_http_server(artifact):
    """The artifact drops into the HTTP server in place of the live
    Predictor (same .predict surface)."""
    import base64
    import io
    import json
    import urllib.request

    from PIL import Image

    from sm3x.serve_http import PredictionServer

    def b64(img):
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG")
        return base64.b64encode(buf.getvalue()).decode()

    server = PredictionServer(ExportedPredictor(artifact),
                              host="127.0.0.1", port=0).start()
    try:
        body = json.dumps({"cases": [{"derm": b64(_imgs(1, 5)[0]),
                                      "clinic": b64(_imgs(1, 6)[0])}]}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/predict", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            preds = json.load(r)["predictions"]
        assert len(preds) == 1 and len(preds[0]) == 8
    finally:
        server.stop()
