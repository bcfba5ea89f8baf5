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
