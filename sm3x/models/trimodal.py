"""Tri-modal contrastive model (the BASELINE.json stretch goal:
"ViT-B/16 dual-branch + metadata (text) third modality, large-batch
contrastive").

Adds a patient-metadata encoder (categorical embeddings over
elevation/sex/location -> MLP) as a third contrastive branch next to the
dermoscopic and clinical image branches. Metadata "views" come from
embedding dropout (feature masking), so the same NT-Xent machinery
applies; cross-modal pairs derm<->clinic, derm<->meta, clinic<->meta are
contrasted with the V32-style per-modality cross projectors.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from sm3x.models import backbones
from sm3x.models.projector import SSLProjector, torch_linear_init
from sm3x.models.simclr import SimCLRBranch
from sm3x.ops.ntxent import grouped_ntxent_loss


class MetaEncoder(nn.Module):
    """Categorical patient metadata -> feature vector. vocab_sizes gives
    the cardinality of each field (elevation/sex/location for Derm7pt)."""

    vocab_sizes: Sequence[int]
    embed_dim: int = 64
    feat_dim: int = 256
    drop_rate: float = 0.2

    @nn.compact
    def __call__(self, codes, train: bool = False):
        """codes (B, F) int32 -> (B, feat_dim)."""
        parts = []
        for i, v in enumerate(self.vocab_sizes):
            emb = nn.Embed(v, self.embed_dim, name=f"embed{i}",
                           param_dtype=jnp.float32)
            parts.append(emb(codes[:, i]))
        x = jnp.concatenate(parts, axis=-1)
        # embedding dropout is the metadata "augmentation" for SSL views
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        x = nn.Dense(self.feat_dim, kernel_init=torch_linear_init(x.shape[-1]),
                     param_dtype=jnp.float32, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.feat_dim, kernel_init=torch_linear_init(self.feat_dim),
                     param_dtype=jnp.float32, name="fc2")(x)
        return x


class TriModalSimCLR(nn.Module):
    """derm/clinic image branches (any registry backbone incl. ViT) +
    metadata branch; per-modality cross projectors (V32 style)."""

    arch: str = "vit_b16"
    proj_dim: int = 128
    meta_vocab_sizes: Sequence[int] = (3, 3, 16)
    meta_feat_dim: int = 256
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None
    remat: bool = False

    def setup(self):
        kw = dict(arch=self.arch, proj_dim=self.proj_dim, dtype=self.dtype,
                  bn_axis_name=self.bn_axis_name, remat=self.remat)
        self.derm_backbone = SimCLRBranch(**kw)
        self.clinic_backbone = SimCLRBranch(**kw)
        self.meta_encoder = MetaEncoder(self.meta_vocab_sizes,
                                        feat_dim=self.meta_feat_dim)
        feat = backbones.feat_dim(self.arch)
        pkw = dict(proj_dim=self.proj_dim, dtype=jnp.float32,
                   bn_axis_name=self.bn_axis_name)
        self.cross_proj_derm = SSLProjector(feat, **pkw)
        self.cross_proj_clinic = SSLProjector(feat, **pkw)
        self.cross_proj_meta = SSLProjector(self.meta_feat_dim, **pkw)

    def __call__(self, derm_imgs, clinic_imgs, meta_codes, train: bool = True):
        derm_f, derm_z = self.derm_backbone(*derm_imgs, train=train)
        clinic_f, clinic_z = self.clinic_backbone(*clinic_imgs, train=train)
        # two stochastic metadata views (dropout draws differ)
        m1 = self.meta_encoder(meta_codes, train)
        m2 = self.meta_encoder(meta_codes, train)
        out = {
            "derm_z": derm_z,
            "clinic_z": clinic_z,
            "cross_derm_z": tuple(self.cross_proj_derm(f, train) for f in derm_f),
            "cross_clinic_z": tuple(self.cross_proj_clinic(f, train)
                                    for f in clinic_f),
            "cross_meta_z": (self.cross_proj_meta(m1, train),
                             self.cross_proj_meta(m2, train)),
        }
        return out

    def extract(self, derm_imgs, clinic_imgs, train: bool = False):
        return (self.derm_backbone.extract(derm_imgs, train),
                self.clinic_backbone.extract(clinic_imgs, train))


def trimodal_ssl_loss(outputs: dict, temperature: float, groups: int = 1,
                      weights=(1.0, 1.0, 1.0)):
    """Intra-modal (derm, clinic) + all cross-modal pairs; metadata's
    intra term contrasts its two dropout views."""
    b2 = outputs["derm_z"].shape[0]
    b = b2 // 2

    def nt(a, c):
        return grouped_ntxent_loss(a, c, temperature, groups)

    derm = nt(outputs["derm_z"][:b], outputs["derm_z"][b:])
    clinic = nt(outputs["clinic_z"][:b], outputs["clinic_z"][b:])
    cm = outputs["cross_meta_z"]
    meta = nt(cm[0], cm[1])
    cd, cc = outputs["cross_derm_z"], outputs["cross_clinic_z"]
    cross = (
        0.5 * (nt(cd[0], cc[0]) + nt(cd[1], cc[1]))      # derm <-> clinic
        + 0.5 * (nt(cd[0], cm[0]) + nt(cd[1], cm[1]))    # derm <-> meta
        + 0.5 * (nt(cc[0], cm[0]) + nt(cc[1], cm[1]))    # clinic <-> meta
    )
    total = weights[0] * derm + weights[1] * clinic + weights[2] * meta + cross
    return total, {"derm": derm, "clinic": clinic, "meta": meta, "cross": cross}
