"""Weight-standardized conv layers (parity with the reference's dormant
src/models/layers.py:23-144 — imported nowhere in the main path there,
provided here for capability parity)."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class ConvWS(nn.Module):
    """Conv2d with weight standardization (zero-mean/unit-std kernel per
    output channel) — the JAX analogue of the reference's ConvWS2d."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1
    use_bias: bool = True
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (kh, kw, cin, self.features), jnp.float32,
        )
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        std = jnp.std(w, axis=(0, 1, 2), keepdims=True)
        w = ((w - mean) / (std + self.eps)).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w,
            window_strides=(self.strides, self.strides),
            padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class ConvAWS(nn.Module):
    """Adaptive weight standardization (ConvAWS2d): learned per-channel
    affine (gamma, beta) re-applied after standardization."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1
    use_bias: bool = True
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (kh, kw, cin, self.features), jnp.float32,
        )
        gamma = self.param("ws_gamma", nn.initializers.ones_init(),
                           (1, 1, 1, self.features), jnp.float32)
        beta = self.param("ws_beta", nn.initializers.zeros_init(),
                          (1, 1, 1, self.features), jnp.float32)
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        std = jnp.std(w, axis=(0, 1, 2), keepdims=True)
        w = ((w - mean) / (std + self.eps)) * gamma + beta
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(self.strides, self.strides),
            padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


def group_norm(num_groups: int = 32, **kw) -> nn.GroupNorm:
    """Reference GroupNorm helper (layers.py:144)."""
    return nn.GroupNorm(num_groups=num_groups, **kw)
