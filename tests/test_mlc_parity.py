"""End-to-end parity of the full MLC inference model (inference.py:53-96
semantics): torch oracle -> convert -> identical per-label logits."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from sm3x import NUM_CLASSES
from sm3x.models.mlc import MLCModel
from sm3x.utils import torch_convert as tc

from torch_ref import torch_resnet18, TorchMultiLabelProjector, randomize_bn_stats


class TorchExtractor(nn.Module):
    def __init__(self):
        super().__init__()
        self.derm_backbone = torch_resnet18()
        self.clinic_backbone = torch_resnet18()

    def extract(self, d, c):
        return [self.derm_backbone(d), self.clinic_backbone(c)]


class TorchMLCModel(nn.Module):
    def __init__(self, feat_dim=1024, proj_dim=32, ff=16, nhead=1, drop=0.1):
        super().__init__()
        self.extractor = TorchExtractor()
        self.projectors = TorchMultiLabelProjector(feat_dim, proj_dim, 8)
        self.mlc_sa = nn.TransformerEncoderLayer(
            d_model=proj_dim, nhead=nhead, dim_feedforward=ff, dropout=drop)
        self.prototypes = nn.ModuleList([nn.Linear(proj_dim, i) for i in NUM_CLASSES])

    def forward(self, d, c):
        feats = torch.cat(self.extractor.extract(d, c), dim=1)
        proj = torch.stack(self.projectors(feats), dim=0)
        sa = self.mlc_sa(proj)
        return [self.prototypes[i](sa[i % len(sa)]) for i in range(len(self.prototypes))]


def test_full_mlc_model_parity():
    gen = torch.Generator().manual_seed(7)
    tm = TorchMLCModel()
    randomize_bn_stats(tm, gen)
    tm.eval()
    d = torch.randn(2, 3, 64, 64, generator=gen)
    c = torch.randn(2, 3, 64, 64, generator=gen)
    with torch.no_grad():
        ref = [o.numpy() for o in tm(d, c)]

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = tc.convert_mlc_model(sd, arch="resnet18", variant="v4")

    jm = MLCModel(arch="resnet18", proj_dim=32, sa_dim_ff=16, sa_dropout=0.1,
                  use_prototype_bias=True, dtype=jnp.float32)
    dj = jnp.asarray(d.numpy().transpose(0, 2, 3, 1))
    cj = jnp.asarray(c.numpy().transpose(0, 2, 3, 1))
    _, preds = jm.apply({"params": params, "batch_stats": stats}, dj, cj)
    assert len(preds) == 8
    for i, (got, want) in enumerate(zip(preds, ref)):
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=5e-4, atol=5e-4,
            err_msg=f"label head {i}")
