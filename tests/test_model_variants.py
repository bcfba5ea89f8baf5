"""Coverage for the remaining model variants: projector v1-v3 conversion,
MLC proj variants, SimCLRSkin plain, remat flag."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from sm3x.models.projector import MultiLabelProjector
from sm3x.models.mlc import MLCHead
from sm3x.utils import torch_convert as tc


def _torch_head(variant, in_dim, proj_dim):
    if variant == "v1":
        layers = [nn.Linear(in_dim, in_dim, bias=False), nn.BatchNorm1d(in_dim),
                  nn.ReLU(), nn.Linear(in_dim, in_dim, bias=False),
                  nn.BatchNorm1d(in_dim), nn.ReLU(),
                  nn.Linear(in_dim, proj_dim, bias=False),
                  nn.BatchNorm1d(proj_dim, affine=False)]
    elif variant == "v2":
        layers = [nn.Linear(in_dim, in_dim, bias=False), nn.BatchNorm1d(in_dim),
                  nn.ReLU(), nn.Linear(in_dim, proj_dim, bias=False),
                  nn.BatchNorm1d(proj_dim, affine=False)]
    elif variant == "v3":
        layers = [nn.Linear(in_dim, proj_dim, bias=False),
                  nn.BatchNorm1d(proj_dim, affine=False)]
    else:
        layers = [nn.Linear(in_dim, proj_dim)]
    return nn.Sequential(*layers)


class TorchMLProjector(nn.Module):
    def __init__(self, variant, in_dim, proj_dim, n=8):
        super().__init__()
        self.projectors = nn.ModuleList(
            [_torch_head(variant, in_dim, proj_dim) for _ in range(n)])

    def forward(self, x):
        return [p(x) for p in self.projectors]


# torchvision-Sequential indices per variant differ from the reference's
# make-projector layout only through the shared _MLP_LAYOUT map — verify
# each variant converts and matches.
@pytest.mark.parametrize("variant", ["v1", "v2", "v3"])
def test_multilabel_projector_variants_parity(variant):
    gen = torch.Generator().manual_seed(5)
    tm = TorchMLProjector(variant, 12, 6)
    from torch_ref import randomize_bn_stats

    randomize_bn_stats(tm, gen)
    tm.eval()
    x = torch.randn(4, 12, generator=gen)
    with torch.no_grad():
        want = np.stack([o.numpy() for o in tm(x)])

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = tc.convert_multilabel_projector(sd, 8, variant, "projectors.")
    jm = MultiLabelProjector(12, 6, 8, variant)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    got = jm.apply(variables, jnp.asarray(x.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_mlc_head_v0_identity():
    m = MLCHead(in_dim=16, proj_dim=16, mlc_proj="v0", sa_dim_ff=8)
    x = jnp.zeros((3, 16), jnp.float32)
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)
    sa, preds = m.apply(v, x)
    assert sa.shape == (1, 3, 16)
    assert len(preds) == 8 and preds[0].shape == (3, 5)


def test_simclr_skin_plain_forward():
    from sm3x.models.simclr import SimCLRSkin

    m = SimCLRSkin(arch="resnet18", proj_dim=8, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.key(0), (x, x), (x, x), train=False)
    out = m.apply(v, (x, x), (x, x), train=False)
    assert set(out) == {"derm_z", "clinic_z"}


def test_resnet_remat_forward():
    from sm3x.models.resnet import build_resnet

    m = build_resnet("resnet18", dtype=jnp.float32, remat=True)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.key(0), x, train=False)

    def loss(p):
        return jnp.sum(m.apply({"params": p, "batch_stats": v["batch_stats"]},
                               x, train=False))

    g = jax.grad(loss)(v["params"])
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))
