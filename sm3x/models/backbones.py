"""Unified backbone registry: ResNet family + ViT family.

The reference dispatches encoders with `resnet.__dict__[arch]`
(simclr.py:47) plus a timm escape hatch (baseline.py:72-76); here one
registry serves both the parity ResNets and the stretch-goal ViTs."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from sm3x.models import resnet as resnet_lib
from sm3x.models import vit as vit_lib


def build_backbone(arch: str, num_classes: Optional[int] = None,
                   dtype=jnp.bfloat16, bn_axis_name=None, remat: bool = False):
    if arch in resnet_lib.FEAT_DIMS:
        if remat in ("attn", "flash", "dots", "mlp", "attn_mlp"):
            raise ValueError(
                f"--use-checkpoint={remat} is an attention-memory mode for "
                f"ViT backbones; {arch} supports bare --use-checkpoint only")
        return resnet_lib.build_resnet(arch, num_classes, dtype,
                                       bn_axis_name, remat)
    if arch in vit_lib.VIT_FEAT_DIMS:
        return vit_lib.build_vit(arch, num_classes, dtype, bn_axis_name, remat)
    raise ValueError(
        f"unknown backbone {arch!r}; have "
        f"{sorted(resnet_lib.FEAT_DIMS) + sorted(vit_lib.VIT_FEAT_DIMS)}")


def feat_dim(arch: str) -> int:
    if arch in resnet_lib.FEAT_DIMS:
        return resnet_lib.FEAT_DIMS[arch]
    if arch in vit_lib.VIT_FEAT_DIMS:
        return vit_lib.VIT_FEAT_DIMS[arch]
    raise ValueError(f"unknown backbone {arch!r}")
