"""ResNet family in Flax (NHWC, TPU-native).

Capability parity with the reference's vendored torchvision ResNet
(/root/reference/src/models/resnet.py:119-991: BasicBlock/Bottleneck,
resnet18..wide_resnet101_2), re-designed for XLA:TPU rather than
translated — NHWC layout (TPU conv native), bf16 compute with fp32
params/statistics, batch-norm whose statistics are global-batch under a
data-sharded jit (the SyncBN of tools/backbone_train.py:510 falls out of
GSPMD for free), and optional `jax.checkpoint` rematerialization of the
residual blocks (the activation-checkpoint lever of
src/models/simclr.py:266-288).

Stride placement follows torchvision v1.5: the 3x3 conv in Bottleneck
carries the stride.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

ModuleDef = Any


class ConvBN(nn.Module):
    """conv (no bias) + batch-norm, the repeated cell of every block."""

    features: int
    kernel: Tuple[int, int]
    strides: int = 1
    groups: int = 1
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=[(k // 2, k // 2) for k in self.kernel],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.bn_axis_name,
            name="bn",
        )(x)
        return x


class BasicBlock(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    groups: int = 1          # must be 1
    base_width: int = 64     # must be 64
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = ConvBN(self.planes, (3, 3), self.strides, dtype=self.dtype,
                     bn_axis_name=self.bn_axis_name, name="cb1")(x, train)
        out = nn.relu(out)
        out = ConvBN(self.planes, (3, 3), 1, dtype=self.dtype,
                     bn_axis_name=self.bn_axis_name, name="cb2")(out, train)
        if self.downsample:
            identity = ConvBN(self.planes * self.expansion, (1, 1), self.strides,
                              dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                              name="down")(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = ConvBN(width, (1, 1), 1, dtype=self.dtype,
                     bn_axis_name=self.bn_axis_name, name="cb1")(x, train)
        out = nn.relu(out)
        out = ConvBN(width, (3, 3), self.strides, groups=self.groups,
                     dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                     name="cb2")(out, train)
        out = nn.relu(out)
        out = ConvBN(self.planes * self.expansion, (1, 1), 1, dtype=self.dtype,
                     bn_axis_name=self.bn_axis_name, name="cb3")(out, train)
        if self.downsample:
            identity = ConvBN(self.planes * self.expansion, (1, 1), self.strides,
                              dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                              name="down")(x, train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Feature extractor: stem + 4 stages + global-avg-pool -> (B, C).

    `num_classes=None` omits the classification fc (the reference always
    replaces `fc` with Identity in the SSL path, simclr.py:49)."""

    block: ModuleDef
    layers: Sequence[int]
    num_classes: Optional[int] = None
    groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool (torch pads 3/1)
        x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         axis_name=self.bn_axis_name, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = self.block
        if self.remat:
            # remat the block body; `train` is static within one trace
            block_cls = nn.remat(self.block, static_argnums=(2,))

        planes = 64
        for stage, n_blocks in enumerate(self.layers):
            for i in range(n_blocks):
                strides = 2 if (stage > 0 and i == 0) else 1
                downsample = (i == 0) and (
                    strides != 1 or (stage == 0 and self.block.expansion != 1)
                )
                x = block_cls(
                    planes=planes,
                    strides=strides,
                    downsample=downsample,
                    groups=self.groups,
                    base_width=self.width_per_group,
                    dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{stage + 1}_{i}",
                )(x, train)
            planes *= 2

        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, C)
        x = x.astype(jnp.float32)
        if self.num_classes is not None:
            x = nn.Dense(self.num_classes, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="fc")(x)
        return x


_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), {}),
    "resnet34": (BasicBlock, (3, 4, 6, 3), {}),
    "resnet50": (Bottleneck, (3, 4, 6, 3), {}),
    "resnet101": (Bottleneck, (3, 4, 23, 3), {}),
    "resnet152": (Bottleneck, (3, 8, 36, 3), {}),
    "resnext50_32x4d": (Bottleneck, (3, 4, 6, 3), {"groups": 32, "width_per_group": 4}),
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3), {"groups": 32, "width_per_group": 8}),
    "resnext101_64x4d": (Bottleneck, (3, 4, 23, 3), {"groups": 64, "width_per_group": 4}),
    "wide_resnet50_2": (Bottleneck, (3, 4, 6, 3), {"width_per_group": 128}),
    "wide_resnet101_2": (Bottleneck, (3, 4, 23, 3), {"width_per_group": 128}),
}

FEAT_DIMS = {
    "resnet18": 512,
    "resnet34": 512,
    "resnet50": 2048,
    "resnet101": 2048,
    "resnet152": 2048,
    "resnext50_32x4d": 2048,
    "resnext101_32x8d": 2048,
    "resnext101_64x4d": 2048,
    "wide_resnet50_2": 2048,
    "wide_resnet101_2": 2048,
}


def build_resnet(
    arch: str,
    num_classes: Optional[int] = None,
    dtype=jnp.bfloat16,
    bn_axis_name: Optional[str] = None,
    remat: bool = False,
) -> ResNet:
    block, layers, extra = _SPECS[arch]
    return ResNet(
        block=block,
        layers=layers,
        num_classes=num_classes,
        dtype=dtype,
        bn_axis_name=bn_axis_name,
        remat=remat,
        **extra,
    )


def feat_dim(arch: str) -> int:
    return FEAT_DIMS[arch]


# torchvision-style callables, mirroring resnet.__dict__[arch] lookup
# (reference src/models/simclr.py:47)
resnet18 = partial(build_resnet, "resnet18")
resnet34 = partial(build_resnet, "resnet34")
resnet50 = partial(build_resnet, "resnet50")
resnet101 = partial(build_resnet, "resnet101")
resnet152 = partial(build_resnet, "resnet152")
resnext50_32x4d = partial(build_resnet, "resnext50_32x4d")
resnext101_32x8d = partial(build_resnet, "resnext101_32x8d")
resnext101_64x4d = partial(build_resnet, "resnext101_64x4d")
wide_resnet50_2 = partial(build_resnet, "wide_resnet50_2")
wide_resnet101_2 = partial(build_resnet, "wide_resnet101_2")
