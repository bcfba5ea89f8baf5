"""Multi-label-classification model (stage 2 + inference).

Reference `Model` (tools/mlc_train.py:58-89 train variant with bias-free
prototypes; tools/mlc_eval.py:67-110 and inference.py:53-96 eval variant
with biased, normal(0,0.01)-initialized prototypes):

    feats = extractor.extract(derm, clinic)      # 2 x (B, 2048)
    feats = concat -> (B, 4096)
    proj  = MultiLabelProjector*(feats)          # (8, B, 512) stacked
    sa    = TransformerEncoderLayer(proj)        # label-token mixing
    preds = [prototypes[i](sa[i % len(sa)]) for i in range(8)]
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

import jax

from sm3x import NUM_CLASSES
from sm3x.models import backbones as resnet_lib
from sm3x.models.projector import MultiLabelProjector, torch_linear_init
from sm3x.models.transformer import TransformerEncoderLayer


class Prototypes(nn.Module):
    """Per-label linear heads with heterogeneous class counts.

    train variant (DeepCluster): bias-free, weights overwritten by k-means
    centroids each epoch (mlc_train.py:64-67,187).
    eval variant: bias + N(0, 0.01) weight init (mlc_eval.py:77-89).
    """

    feat_dim: int
    num_classes: Sequence[int] = tuple(NUM_CLASSES)
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sa_feats):
        """sa_feats (H, B, D) -> list of (B, C_i)."""
        n_heads = sa_feats.shape[0]
        preds = []
        for i, c in enumerate(self.num_classes):
            kinit = (
                nn.initializers.normal(stddev=0.01)
                if self.use_bias
                else torch_linear_init(self.feat_dim)
            )
            preds.append(
                nn.Dense(
                    c,
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    kernel_init=kinit,
                    bias_init=nn.initializers.zeros_init(),
                    name=f"proto{i}",
                )(sa_feats[i % n_heads])
            )
        return preds


class MLCHead(nn.Module):
    """projectors + transformer mixing + prototype heads, taking the
    already-extracted concatenated features (B, feat_dim_in).

    Split from the extractor so the frozen-backbone stages can run the
    (expensive, frozen) extractor once and train only this head."""

    in_dim: int
    proj_dim: int = 512
    num_labels: int = 8
    mlc_proj: str = "v4"
    l2_norm: bool = False
    n_heads: int = 1
    sa_dim_ff: int = 128
    sa_dropout: float = 0.1
    use_prototype_bias: bool = False
    num_classes: Sequence[int] = tuple(NUM_CLASSES)
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, train: bool = False) -> Tuple[jnp.ndarray, list]:
        proj = MultiLabelProjector(
            self.in_dim, self.proj_dim, self.num_labels, self.mlc_proj,
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="projectors",
        )(feats, train)                      # (H, B, P)
        sa = TransformerEncoderLayer(
            self.proj_dim, self.n_heads, self.sa_dim_ff, self.sa_dropout,
            dtype=self.dtype, name="mlc_sa",
        )(proj, deterministic=not train)     # (H, B, P)
        if self.l2_norm:
            n = jnp.sqrt(jnp.sum(jnp.square(sa), axis=-1, keepdims=True))
            sa = sa / jnp.maximum(n, 1e-12)
        preds = Prototypes(
            self.proj_dim, self.num_classes, self.use_prototype_bias,
            dtype=self.dtype, name="prototypes",
        )(sa)
        return sa, preds


class _BareEncoder(nn.Module):
    """One bare ResNet under an `encoder` scope — keeps the parameter tree
    aligned with the reference's `extractor.derm_backbone.encoder.*` keys
    after stage-2 nulls the SSL projectors (mlc_train.py:344-346)."""

    arch: str
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    def setup(self):
        self.encoder = resnet_lib.build_backbone(
            self.arch, dtype=self.dtype, bn_axis_name=self.bn_axis_name)

    def __call__(self, x, train: bool = False):
        return self.encoder(x, train)


class DualExtractor(nn.Module):
    """Two bare encoders; extract() returns the concatenated (B, 2*feat)
    late-fusion feature (reference Model.forward, mlc_train.py:71-72)."""

    arch: str = "resnet50"
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    def setup(self):
        self.derm_backbone = _BareEncoder(self.arch, self.dtype, self.bn_axis_name)
        self.clinic_backbone = _BareEncoder(self.arch, self.dtype, self.bn_axis_name)
        self.feat_dim = 2 * resnet_lib.feat_dim(self.arch)

    def __call__(self, derm_imgs, clinic_imgs, train: bool = False):
        d = self.derm_backbone(derm_imgs, train)
        c = self.clinic_backbone(clinic_imgs, train)
        return jnp.concatenate([d, c], axis=1)


class MLCModel(nn.Module):
    """Full stage-2 / inference model: DualExtractor + MLCHead.

    `extractor_train` / `head_train` reproduce the reference's granular
    train/eval submodule switches (mlc_eval.py:125-139, mlc_train.py:231-237):
    the flags control BN statistic mode and dropout; actual parameter
    freezing is an optimizer mask in the train loops. `stop_extractor_grad`
    cuts the (useless) backward through a frozen backbone entirely.
    """

    arch: str = "resnet50"
    proj_dim: int = 512
    num_labels: int = 8
    mlc_proj: str = "v4"
    l2_norm: bool = False
    n_heads: int = 1
    sa_dim_ff: int = 128
    sa_dropout: float = 0.1
    use_prototype_bias: bool = False
    num_classes: Sequence[int] = tuple(NUM_CLASSES)
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    def setup(self):
        self.extractor = DualExtractor(self.arch, self.dtype, self.bn_axis_name)
        in_dim = 2 * resnet_lib.feat_dim(self.arch)
        self.head = MLCHead(
            in_dim=in_dim,
            proj_dim=self.proj_dim,
            num_labels=self.num_labels,
            mlc_proj=self.mlc_proj,
            l2_norm=self.l2_norm,
            n_heads=self.n_heads,
            sa_dim_ff=self.sa_dim_ff,
            sa_dropout=self.sa_dropout,
            use_prototype_bias=self.use_prototype_bias,
            num_classes=self.num_classes,
            dtype=jnp.float32,
            bn_axis_name=self.bn_axis_name,
        )

    def __call__(
        self,
        derm_imgs,
        clinic_imgs,
        extractor_train: bool = False,
        head_train: bool = False,
        stop_extractor_grad: bool = True,
    ):
        feats = self.extractor(derm_imgs, clinic_imgs, extractor_train)
        if stop_extractor_grad:
            feats = jax.lax.stop_gradient(feats)
        return self.head(feats.astype(jnp.float32), head_train)
