"""Model parity: random torch weights -> convert -> identical forward."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sm3x.models import resnet as jresnet
from sm3x.models.projector import SSLProjector, MultiLabelProjector
from sm3x.models.transformer import TransformerEncoderLayer
from sm3x.utils import torch_convert as tc

from torch_ref import (
    torch_resnet18,
    torch_resnet50,
    torch_ssl_projector,
    TorchMultiLabelProjector,
    randomize_bn_stats,
)


def to_np(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.mark.parametrize("arch,builder,size", [
    ("resnet18", torch_resnet18, 64),
    ("resnet50", torch_resnet50, 64),
])
def test_resnet_forward_parity(arch, builder, size):
    gen = torch.Generator().manual_seed(0)
    tm = builder()
    randomize_bn_stats(tm, gen)
    tm.eval()
    x = torch.randn(2, 3, size, size, generator=gen)
    with torch.no_grad():
        ref = tm(x).numpy()

    params, stats = tc.convert_resnet(to_np(tm.state_dict()), arch)
    jm = jresnet.build_resnet(arch, dtype=jnp.float32)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
    out = jm.apply({"params": params, "batch_stats": stats}, xj, train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_ssl_projector_parity():
    gen = torch.Generator().manual_seed(1)
    tm = torch_ssl_projector(32, 16)
    randomize_bn_stats(tm, gen)
    tm.eval()
    x = torch.randn(6, 32, generator=gen)
    with torch.no_grad():
        ref = tm(x).numpy()

    params, stats = tc.convert_ssl_projector(to_np(tm.state_dict()))
    jm = SSLProjector(32, 16)
    out = jm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(x.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_multilabel_projector_v4_parity():
    gen = torch.Generator().manual_seed(2)
    tm = TorchMultiLabelProjector(24, 12, 8)
    tm.eval()
    x = torch.randn(5, 24, generator=gen)
    with torch.no_grad():
        ref = np.stack([o.numpy() for o in tm(x)])  # (8, 5, 12)

    params, stats = tc.convert_multilabel_projector(
        to_np(tm.state_dict()), num_labels=8, variant="v4", prefix="projectors.")
    jm = MultiLabelProjector(24, 12, 8, "v4")
    variables = {"params": {"heads": params["heads"]}}
    out = jm.apply(variables, jnp.asarray(x.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nhead", [1, 4])
def test_transformer_layer_parity(nhead):
    d, ff, s, b = 32, 16, 8, 3
    tm = torch.nn.TransformerEncoderLayer(
        d_model=d, nhead=nhead, dim_feedforward=ff, dropout=0.1)
    tm.eval()
    gen = torch.Generator().manual_seed(3)
    x = torch.randn(s, b, d, generator=gen)
    with torch.no_grad():
        ref = tm(x).numpy()

    params = tc.convert_transformer_layer(to_np(tm.state_dict()), prefix="")
    jm = TransformerEncoderLayer(d, nhead, ff, 0.1)
    out = jm.apply({"params": params}, jnp.asarray(x.numpy()), deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
