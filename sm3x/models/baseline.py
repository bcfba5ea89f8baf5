"""Supervised baselines and linear evaluators.

Parity targets: `Baseline`/`SingleBaseline`/`BaselineMLP1-3`
(/root/reference/src/models/baseline.py) and the evaluator heads
(/root/reference/src/models/evaluator.py:123-147). Heads are N(0,0.01)
weight / zero bias initialized exactly like the reference `_init_fc`.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from sm3x import NUM_CLASSES
from sm3x.models import backbones as resnet_lib


def _head_dense(c, name, dtype=jnp.float32):
    return nn.Dense(
        c, dtype=dtype, param_dtype=jnp.float32,
        kernel_init=nn.initializers.normal(stddev=0.01),
        bias_init=nn.initializers.zeros_init(), name=name,
    )


class MultiHeadClassifier(nn.Module):
    """8 linear heads on a shared feature (LogisticRegressMultiHeadEvaluator,
    evaluator.py:135-147)."""

    num_classes: Sequence[int] = tuple(NUM_CLASSES)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return [_head_dense(c, f"head{i}", self.dtype)(x)
                for i, c in enumerate(self.num_classes)]


class LogisticRegressEvaluator(nn.Module):
    """Single linear probe head (evaluator.py:123-132)."""

    n_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _head_dense(self.n_classes, "classifier", self.dtype)(x)


class MLPHead(nn.Module):
    """BaselineMLP1/2/3 head variants: Linear-ReLU[-Dropout|-BN]-Linear."""

    n_classes: int
    variant: int = 1
    hidden: int = 512
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.normal(stddev=0.01),
                     bias_init=nn.initializers.zeros_init(), name="fc1")(x)
        x = nn.relu(x)
        if self.variant == 2:
            x = nn.Dropout(0.5, deterministic=not train)(x)
        elif self.variant == 3:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             axis_name=self.bn_axis_name, name="bn")(x)
        x = nn.Dense(self.n_classes, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.normal(stddev=0.01),
                     bias_init=nn.initializers.zeros_init(), name="fc2")(x)
        return x


class Baseline(nn.Module):
    """Dual-backbone + 8 linear heads (baseline.py:60-117). `mlp_variant`
    None = plain linear heads; 1/2/3 = BaselineMLP1/2/3."""

    arch: str = "resnet50"
    num_classes: Sequence[int] = tuple(NUM_CLASSES)
    mlp_variant: Optional[int] = None
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    def setup(self):
        if self.arch.startswith("timm"):
            # the reference escape-hatches to timm (baseline.py:72-76);
            # the TPU build ships its own backbone registry instead
            from sm3x.models.resnet import FEAT_DIMS
            from sm3x.models.vit import VIT_FEAT_DIMS

            raise ValueError(
                f"timm arch {self.arch!r} is not available in the TPU build; "
                f"use one of {sorted(FEAT_DIMS) + sorted(VIT_FEAT_DIMS)}")
        self.derm_backbone = resnet_lib.build_backbone(
            self.arch, dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        self.clinic_backbone = resnet_lib.build_backbone(
            self.arch, dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        self.feat_dim = resnet_lib.feat_dim(self.arch) * 2
        if self.mlp_variant is None:
            self.classifier = MultiHeadClassifier(self.num_classes)
        else:
            self.classifier = [
                MLPHead(c, variant=self.mlp_variant) for c in self.num_classes
            ]

    def __call__(self, derm_imgs, clinic_imgs, train: bool = False,
                 stop_backbone_grad: bool = False):
        d = self.derm_backbone(derm_imgs, train)
        c = self.clinic_backbone(clinic_imgs, train)
        feats = jnp.concatenate([d, c], axis=1)
        if stop_backbone_grad:
            # frozen-backbone policies (--finetune fc): cut the gradient
            # here so XLA prunes the two ResNet backward passes entirely —
            # the optimizer mask alone only discards the computed grads
            import jax

            feats = jax.lax.stop_gradient(feats)
        if self.mlp_variant is None:
            return self.classifier(feats)
        return [h(feats, train) for h in self.classifier]

    def extract(self, derm_imgs, clinic_imgs, train: bool = False):
        return (self.derm_backbone(derm_imgs, train),
                self.clinic_backbone(clinic_imgs, train))


class SingleBaseline(nn.Module):
    """Single-modality baseline (baseline.py:9-57)."""

    arch: str = "resnet50"
    num_classes: Sequence[int] = tuple(NUM_CLASSES)
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    def setup(self):
        self.derm_backbone = resnet_lib.build_backbone(
            self.arch, dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        self.classifier = MultiHeadClassifier(self.num_classes)

    def __call__(self, x, train: bool = False):
        return self.classifier(self.derm_backbone(x, train))
