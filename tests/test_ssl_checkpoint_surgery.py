"""End-to-end stage-1 .pth surgery: a torch SimCLRSkinV32-shaped model's
checkpoint loads into the JAX extractor with identical extract() output
(the mlc_train.py:341-346 / backbone_eval.py:278-296 conventions)."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from sm3x.models.simclr import SimCLRSkinV3
from sm3x.utils import torch_convert as tc

from torch_ref import torch_resnet18, torch_ssl_projector, randomize_bn_stats


class TorchSimCLRBranch(nn.Module):
    def __init__(self, proj_dim=16):
        super().__init__()
        self.encoder = torch_resnet18()
        self.projector = torch_ssl_projector(512, proj_dim)


class TorchSimCLRSkinV32(nn.Module):
    def __init__(self, proj_dim=16):
        super().__init__()
        self.derm_backbone = TorchSimCLRBranch(proj_dim)
        self.clinic_backbone = TorchSimCLRBranch(proj_dim)
        self.cross_proj = nn.ModuleList(
            [torch_ssl_projector(512, proj_dim) for _ in range(2)])


def test_ssl_pth_surgery_extract_parity(tmp_path):
    gen = torch.Generator().manual_seed(11)
    tm = TorchSimCLRSkinV32()
    randomize_bn_stats(tm, gen)
    tm.eval()
    d = torch.randn(2, 3, 64, 64, generator=gen)
    c = torch.randn(2, 3, 64, 64, generator=gen)
    with torch.no_grad():
        want_d = tm.derm_backbone.encoder(d).numpy()
        want_c = tm.clinic_backbone.encoder(c).numpy()

    # save the training-state wrapper the reference writes
    path = str(tmp_path / "ckp_399.pth")
    torch.save({"epoch": 400, "state_dict": tm.state_dict()}, path)

    from sm3x.utils.checkpoint import load_torch_ssl_checkpoint

    params, stats = load_torch_ssl_checkpoint(path, "resnet18",
                                              shared_cross_proj=False)
    jm = SimCLRSkinV3(arch="resnet18", proj_dim=16, shared_cross_proj=False,
                      dtype=jnp.float32)
    dj = jnp.asarray(d.numpy().transpose(0, 2, 3, 1))
    cj = jnp.asarray(c.numpy().transpose(0, 2, 3, 1))
    got_d, got_c = jm.apply({"params": params, "batch_stats": stats},
                            dj, cj, train=False, method=jm.extract)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_c), want_c, rtol=2e-4, atol=2e-4)

    # cross projectors converted too (full SSL state)
    assert "cross_proj_derm" in params and "cross_proj_clinic" in params
    # and the full model forward runs
    out = jm.apply({"params": params, "batch_stats": stats},
                   (dj, dj), (cj, cj), train=False)
    assert out["derm_z"].shape == (4, 16)