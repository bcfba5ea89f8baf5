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


def test_vit_multicrop_forward_and_loss(rng_np):
    """ViT + multi-crop works since the pos_embed learned at the global
    resolution is bilinearly interpolated to each local-view grid
    (sm3x/models/vit.py) — local views at a different size forward
    through the same encoder and contribute a finite 'local' loss term.
    (Replaces the round-2 guard test: the trainer used to REJECT
    ViT + SevenPCSwavDataset.)"""
    from sm3x.models.simclr import SimCLRSkinV32
    from sm3x.losses.ssl import ssl_loss

    m = SimCLRSkinV32(arch="vit_t16", proj_dim=8, dtype=jnp.float32)
    g = jnp.asarray(rng_np.normal(size=(4, 2, 32, 32, 3)), jnp.float32)
    loc = jnp.asarray(rng_np.normal(size=(2, 2, 16, 16, 3)), jnp.float32)
    variables = m.init(jax.random.key(0), (g[0], g[1]), (g[2], g[3]),
                       train=False)
    out = m.apply(variables, (g[0], g[1]), (g[2], g[3]),
                  (loc[0],), (loc[1],), train=False, method="multicrop")
    assert out["derm_local_z"][0].shape == (2, 8)
    total, parts = ssl_loss(out, 2, temperature=0.1, local_weight=0.5)
    assert np.isfinite(float(total)) and "local" in parts


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
