"""Dual-modality SimCLR models (the stage-1 SSL family).

Reference family: SimCLR, SimCLRSkin, V2/V21/V22/V23, V3, V32
(/root/reference/src/models/simclr.py). Only V3/V32 (+style variants) are
reachable from the reference CLI (tools/backbone_train.py:484-507); all
variants are provided here.

Design: the Flax modules return *projections* — the NT-Xent logits
construction lives in sm3x.ops.ntxent where it runs fused (one MXU
matmul + masked logsumexp) instead of building the gathered (2B, 2B-1)
matrix. `sm3x.losses.ssl` assembles the per-style loss exactly as the
reference weights it (backbone_train.py:98-121).

Batch-norm batching is preserved bit-for-bit in structure: each encoder
view is a separate BN batch (simclr.py:58-59); the intra-modal projector
sees the concatenated 2B views (simclr.py:61); the cross projectors see
each view separately (one B batch per `_cal_logits` operand,
simclr.py:293). With a data-sharded jit these statistics are global-batch
— the SyncBN of backbone_train.py:510.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from sm3x.models import backbones as resnet_lib
from sm3x.models.projector import SSLProjector


class SimCLRBranch(nn.Module):
    """One modality: ResNet encoder + 3-layer MLP projector
    (reference SimCLR, simclr.py:31-96)."""

    arch: str = "resnet50"
    proj_dim: int = 128
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None
    remat: bool = False

    def setup(self):
        self.encoder = resnet_lib.build_backbone(
            self.arch, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
            remat=self.remat,
        )
        self.encoder_out_dim = resnet_lib.feat_dim(self.arch)
        self.projector = SSLProjector(
            self.encoder_out_dim, self.proj_dim,
            dtype=jnp.float32, bn_axis_name=self.bn_axis_name,
        )

    def __call__(self, x1, x2, train: bool = True):
        """Returns ((f1, f2), z) with z = projector(cat(f1, f2)): (2B, P).

        The two views are deliberately SEPARATE encoder passes. For BN
        encoders that is reference semantics (each view is its own stat
        batch); for stat-free ViT a fused 2B pass is mathematically
        identical and was tried in round 3 — measured 0.78× (877 vs 1122
        img/s at b=64): the SSL step is HBM-bound and XLA schedules two
        sequential B-passes better under activation pressure than one 2B
        graph (it even added ~6% recompute FLOPs to fit). Same verdict as
        round 1's ResNet fused-2B probe — do not re-fuse (BENCH.md r3)."""
        f1 = self.encoder(x1, train)
        f2 = self.encoder(x2, train)
        z = self.projector(jnp.concatenate([f1, f2], axis=0), train)
        return (f1, f2), z

    def extract(self, x, train: bool = False):
        return self.encoder(x, train)


class SimCLR(nn.Module):
    """Single-modality SimCLR (reference simclr.py:31-96): encoder +
    projector; __call__ returns the reference's (logits, labels) pair
    (positives-first layout) for API parity — training code should prefer
    the fused loss on the projections."""

    arch: str = "resnet50"
    proj_dim: int = 128
    temperature: float = 0.5
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None
    remat: bool = False

    def setup(self):
        self.branch = SimCLRBranch(self.arch, self.proj_dim, self.dtype,
                                   self.bn_axis_name, self.remat)

    def __call__(self, x1, x2, train: bool = True):
        from sm3x.ops.ntxent import ntxent_logits

        _, z = self.branch(x1, x2, train)
        b = x1.shape[0]
        return ntxent_logits(z[:b], z[b:], self.temperature)

    def extract(self, imgs, train: bool = False):
        return self.branch.extract(imgs, train)


class SimCLRSkin(nn.Module):
    """Two independent branches, intra-modal losses only (simclr.py:99-115)."""

    arch: str = "resnet50"
    proj_dim: int = 128
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None
    remat: bool = False

    def setup(self):
        kw = dict(arch=self.arch, proj_dim=self.proj_dim, dtype=self.dtype,
                  bn_axis_name=self.bn_axis_name, remat=self.remat)
        self.derm_backbone = SimCLRBranch(**kw)
        self.clinic_backbone = SimCLRBranch(**kw)

    def __call__(self, derm_imgs, clinic_imgs, train: bool = True):
        _, derm_z = self.derm_backbone(*derm_imgs, train=train)
        _, clinic_z = self.clinic_backbone(*clinic_imgs, train=train)
        return {"derm_z": derm_z, "clinic_z": clinic_z}

    def extract(self, derm_imgs, clinic_imgs, train: bool = False):
        return (
            self.derm_backbone.extract(derm_imgs, train),
            self.clinic_backbone.extract(clinic_imgs, train),
        )


class SimCLRSkinV3(nn.Module):
    """Cross-modal contrast with a SHARED cross projector (simclr.py:250-396).

    Output dict:
      derm_z / clinic_z       (2B, P) intra-modal projections
      cross_derm_z            ((B,P), (B,P)) shared-proj of derm f1, f2
      cross_clinic_z          ((B,P), (B,P)) shared-proj of clinic f1, f2
    The style-dependent pairing (0/1/2) happens in the loss.
    """

    arch: str = "resnet50"
    proj_dim: int = 128
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None
    remat: bool = False
    shared_cross_proj: bool = True  # False = V32 (independent projectors)

    def setup(self):
        kw = dict(arch=self.arch, proj_dim=self.proj_dim, dtype=self.dtype,
                  bn_axis_name=self.bn_axis_name, remat=self.remat)
        self.derm_backbone = SimCLRBranch(**kw)
        self.clinic_backbone = SimCLRBranch(**kw)
        feat = resnet_lib.feat_dim(self.arch)
        self.derm_feat_dim = feat
        self.clinic_feat_dim = feat
        pkw = dict(proj_dim=self.proj_dim, dtype=jnp.float32,
                   bn_axis_name=self.bn_axis_name)
        if self.shared_cross_proj:
            self.cross_proj = SSLProjector(feat, **pkw)
        else:
            self.cross_proj_derm = SSLProjector(feat, **pkw)
            self.cross_proj_clinic = SSLProjector(feat, **pkw)

    def _cross(self, which: str, f, train: bool):
        if self.shared_cross_proj:
            proj = self.cross_proj
        else:
            proj = self.cross_proj_derm if which == "derm" else self.cross_proj_clinic
        return proj(f, train)

    def __call__(self, derm_imgs, clinic_imgs, train: bool = True):
        derm_f, derm_z = self.derm_backbone(*derm_imgs, train=train)
        clinic_f, clinic_z = self.clinic_backbone(*clinic_imgs, train=train)
        # each view is its own BN batch, matching per-call projector
        # application in the reference's _cal_logits (simclr.py:293)
        cd = tuple(self._cross("derm", f, train) for f in derm_f)
        cc = tuple(self._cross("clinic", f, train) for f in clinic_f)
        return {
            "derm_z": derm_z,
            "clinic_z": clinic_z,
            "cross_derm_z": cd,
            "cross_clinic_z": cc,
        }

    def extract(self, derm_imgs, clinic_imgs, train: bool = False):
        return (
            self.derm_backbone.extract(derm_imgs, train),
            self.clinic_backbone.extract(clinic_imgs, train),
        )

    def multicrop(self, derm_imgs, clinic_imgs, derm_locals, clinic_locals,
                  train: bool = True):
        """SwAV-style multi-crop forward (sm3x extension — the reference's
        SevenPCSwavDataset, datasets.py:608-707, is CLI-unreachable there):
        the standard two-global-view forward plus intra-projected local
        views. Each local view is encoded and projected by its modality's
        intra projector as its own BN batch; the loss pairs each local
        against global view 1 (sm3x.losses.ssl)."""
        out = self(derm_imgs, clinic_imgs, train)
        out["derm_local_z"] = tuple(
            self.derm_backbone.projector(
                self.derm_backbone.encoder(v, train), train)
            for v in derm_locals)
        out["clinic_local_z"] = tuple(
            self.clinic_backbone.projector(
                self.clinic_backbone.encoder(v, train), train)
            for v in clinic_locals)
        return out


def SimCLRSkinV32(**kw) -> SimCLRSkinV3:
    """Independent derm/clinic cross projectors (simclr.py:399-482)."""
    return SimCLRSkinV3(shared_cross_proj=False, **kw)


class SimCLRSkinV2(nn.Module):
    """Concat-fusion cross contrast (simclr.py:118-247). `fusion` selects
    V2 ("concat"), V21 ("concat_cross"), V22 ("concat_both"), V23 ("add")."""

    arch: str = "resnet50"
    proj_dim: int = 128
    fusion: str = "concat"
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None
    remat: bool = False

    def setup(self):
        kw = dict(arch=self.arch, proj_dim=self.proj_dim, dtype=self.dtype,
                  bn_axis_name=self.bn_axis_name, remat=self.remat)
        self.derm_backbone = SimCLRBranch(**kw)
        self.clinic_backbone = SimCLRBranch(**kw)
        feat = resnet_lib.feat_dim(self.arch)
        cross_dim = feat if self.fusion == "add" else 2 * feat
        self.cross_proj = SSLProjector(
            cross_dim, self.proj_dim, dtype=jnp.float32,
            bn_axis_name=self.bn_axis_name,
        )

    def __call__(self, derm_imgs, clinic_imgs, train: bool = True):
        derm_f, derm_z = self.derm_backbone(*derm_imgs, train=train)
        clinic_f, clinic_z = self.clinic_backbone(*clinic_imgs, train=train)
        out = {"derm_z": derm_z, "clinic_z": clinic_z}

        def fuse(a, b):
            if self.fusion == "add":
                return a + b
            return jnp.concatenate([a, b], axis=1)

        if self.fusion in ("concat", "add"):
            pairs = [(fuse(derm_f[0], clinic_f[0]), fuse(derm_f[1], clinic_f[1]))]
        elif self.fusion == "concat_cross":
            pairs = [(fuse(derm_f[0], clinic_f[1]), fuse(derm_f[1], clinic_f[0]))]
        elif self.fusion == "concat_both":
            pairs = [
                (fuse(derm_f[0], clinic_f[0]), fuse(derm_f[1], clinic_f[1])),
                (fuse(derm_f[0], clinic_f[1]), fuse(derm_f[1], clinic_f[0])),
            ]
        else:
            raise ValueError(self.fusion)
        # V2x projects the concatenated pair as ONE 2B BN batch
        # (simclr.py:137: projector(torch.cat([f1, f2])))
        out["cross_z"] = tuple(
            self.cross_proj(jnp.concatenate([a, b], axis=0), train) for a, b in pairs
        )
        return out

    def extract(self, derm_imgs, clinic_imgs, train: bool = False):
        return (
            self.derm_backbone.extract(derm_imgs, train),
            self.clinic_backbone.extract(clinic_imgs, train),
        )


def build_ssl_model(
    arch_version: str,
    arch: str = "resnet50",
    proj_dim: int = 128,
    dtype: Any = jnp.bfloat16,
    bn_axis_name: Optional[str] = None,
    remat: bool = False,
) -> Tuple[nn.Module, int]:
    """CLI mapping of --arch-version (backbone_train.py:484-507).
    Returns (model, style)."""
    kw = dict(arch=arch, proj_dim=proj_dim, dtype=dtype,
              bn_axis_name=bn_axis_name, remat=remat)
    versions = {
        "v3": (True, 0), "v311": (True, 1), "v312": (True, 2),
        "v32": (False, 0), "v321": (False, 1), "v322": (False, 2),
    }
    if arch_version not in versions:
        raise ValueError(f"unknown arch_version {arch_version!r}")
    shared, style = versions[arch_version]
    return SimCLRSkinV3(shared_cross_proj=shared, **kw), style
