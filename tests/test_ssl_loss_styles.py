"""Style-dependent SSL loss assembly (backbone_train.py:98-121 weighting)
and the V2x model family forwards."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sm3x.losses.ssl import ssl_loss
from test_ntxent import torch_ntxent


def _fake_outputs(rng, b=6, p=8):
    def z(shape):
        return rng.normal(size=shape).astype(np.float32)

    return {
        "derm_z": z((2 * b, p)),
        "clinic_z": z((2 * b, p)),
        "cross_derm_z": (z((b, p)), z((b, p))),
        "cross_clinic_z": (z((b, p)), z((b, p))),
    }


def _nt(a, b, t=0.1):
    return float(torch_ntxent(torch.tensor(a), torch.tensor(b), t)[1])


@pytest.mark.parametrize("style", [0, 1, 2])
def test_ssl_loss_style_weighting(rng_np, style):
    outs = _fake_outputs(rng_np)
    b = 6
    total, parts = ssl_loss(
        {k: jax.tree.map(jnp.asarray, v) for k, v in outs.items()},
        style, temperature=0.1, groups=1)

    derm = _nt(outs["derm_z"][:b], outs["derm_z"][b:])
    clinic = _nt(outs["clinic_z"][:b], outs["clinic_z"][b:])
    cd, cc = outs["cross_derm_z"], outs["cross_clinic_z"]
    if style == 0:
        cross = 0.5 * _nt(cd[0], cc[0]) + 0.5 * _nt(cd[1], cc[1])
    elif style == 1:
        cross = 0.5 * _nt(cd[0], cc[1]) + 0.5 * _nt(cd[1], cc[0])
    else:
        cross = 0.25 * (_nt(cd[0], cc[0]) + _nt(cd[0], cc[1])
                        + _nt(cd[1], cc[0]) + _nt(cd[1], cc[1]))

    np.testing.assert_allclose(float(parts["derm"]), derm, rtol=1e-4)
    np.testing.assert_allclose(float(parts["clinic"]), clinic, rtol=1e-4)
    np.testing.assert_allclose(float(parts["cross"]), cross, rtol=1e-4)
    np.testing.assert_allclose(float(total), derm + clinic + cross, rtol=1e-4)


def test_ssl_loss_pallas_flag_runs_on_cpu(rng_np):
    """--use-pallas-ntxent must not crash off-TPU: the fused dispatcher
    falls back to the XLA composition on the CPU backend (regression:
    ssl_loss used to call the raw Pallas kernel unconditionally)."""
    outs = {k: jax.tree.map(jnp.asarray, v)
            for k, v in _fake_outputs(rng_np).items()}
    t_xla, _ = ssl_loss(outs, 0, temperature=0.1, groups=2)
    t_pallas, _ = ssl_loss(outs, 0, temperature=0.1, groups=2,
                           use_pallas=True)
    np.testing.assert_allclose(float(t_pallas), float(t_xla), rtol=1e-6)


def test_ssl_loss_pallas_flag_under_jit(rng_np):
    """The train step that consumes use_pallas=True is jitted
    (backbone_train.py) — inputs are Tracers there, so the fused
    dispatcher must not inspect z1.devices() (regression: round-2's
    dispatcher raised ConcretizationTypeError at trace time)."""
    outs = {k: jax.tree.map(jnp.asarray, v)
            for k, v in _fake_outputs(rng_np).items()}

    @jax.jit
    def step(o):
        total, _ = ssl_loss(o, 0, temperature=0.1, groups=2,
                            use_pallas=True)
        return total

    t_eager, _ = ssl_loss(outs, 0, temperature=0.1, groups=2)
    np.testing.assert_allclose(float(step(outs)), float(t_eager), rtol=1e-5)


def test_ssl_loss_modality_weights(rng_np):
    outs = {k: jax.tree.map(jnp.asarray, v)
            for k, v in _fake_outputs(rng_np).items()}
    total, parts = ssl_loss(outs, 0, temperature=0.1,
                            modality_weights=(2.0, 0.5))
    expect = (2.0 * float(parts["derm"]) + 0.5 * float(parts["clinic"])
              + float(parts["cross"]))
    np.testing.assert_allclose(float(total), expect, rtol=1e-5)


def test_ssl_trainer_rejects_vit_multicrop(tmp_path):
    """ViT pos_embed is fixed-size; multi-crop local views must be
    rejected upfront, not crash mid-trace."""
    from sm3x.core.config import SSLConfig
    from sm3x.train.backbone_train import SSLTrainer

    cfg = SSLConfig()
    cfg.model.arch = "vit_t16"
    cfg.data.data_name = "SevenPCSwavDataset"
    cfg.run.log_path = str(tmp_path)
    with pytest.raises(ValueError, match="multi-crop"):
        SSLTrainer(cfg)


@pytest.mark.parametrize("fusion,n_pairs", [
    ("concat", 1), ("concat_cross", 1), ("concat_both", 2), ("add", 1),
])
def test_simclr_v2_family_forward(fusion, n_pairs):
    from sm3x.models.simclr import SimCLRSkinV2

    m = SimCLRSkinV2(arch="resnet18", proj_dim=8, fusion=fusion,
                     dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = m.init(jax.random.key(0), (x, x), (x, x), train=False)
    out = m.apply(variables, (x, x), (x, x), train=False)
    assert out["derm_z"].shape == (4, 8)
    assert len(out["cross_z"]) == n_pairs
    assert out["cross_z"][0].shape == (4, 8)


def test_simclr_single_modality_logits_api():
    from sm3x.models.simclr import SimCLR

    m = SimCLR(arch="resnet18", proj_dim=8, temperature=0.5, dtype=jnp.float32)
    x = jnp.zeros((3, 32, 32, 3), jnp.float32)
    variables = m.init(jax.random.key(0), x, x, train=False)
    logits, labels = m.apply(variables, x, x, train=False)
    assert logits.shape == (6, 5)  # (2B, 2B-1)
    assert np.all(np.asarray(labels) == 0)
