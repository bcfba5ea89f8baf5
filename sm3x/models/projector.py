"""Projection heads.

* `SSLProjector` — the SimCLR 3-layer MLP with BN
  (reference make_projector, src/models/simclr.py:17-27).
* `MultiLabelProjector{,2,3,4}` — N parallel per-label heads
  (src/models/projector.py:5-78). The reference loops 8 nn.Sequential's;
  here the head axis is lifted with `nn.vmap`, so all 8 projections are
  ONE stacked (H, in, out) einsum on the MXU, and the stacked weight can
  be sharded over the "model" mesh axis for tensor parallelism.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn


def torch_linear_init(fan_in: int):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _dense(features, use_bias=True, name=None, fan_in=None, dtype=jnp.float32):
    kinit = (
        torch_linear_init(fan_in) if fan_in is not None else nn.initializers.lecun_normal()
    )
    binit = torch_linear_init(fan_in) if fan_in is not None else nn.initializers.zeros_init()
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kinit,
        bias_init=binit,
        name=name,
    )


class SSLProjector(nn.Module):
    """Linear-BN-ReLU x2 + Linear-BN(affine=False); all linears bias-free."""

    in_dim: int
    proj_dim: int
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name, affine=True: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            use_bias=affine,
            use_scale=affine,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.bn_axis_name,
            name=name,
        )
        x = _dense(self.in_dim, use_bias=False, fan_in=self.in_dim,
                   dtype=self.dtype, name="fc1")(x)
        x = nn.relu(bn("bn1")(x))
        x = _dense(self.in_dim, use_bias=False, fan_in=self.in_dim,
                   dtype=self.dtype, name="fc2")(x)
        x = nn.relu(bn("bn2")(x))
        x = _dense(self.proj_dim, use_bias=False, fan_in=self.in_dim,
                   dtype=self.dtype, name="fc3")(x)
        x = bn("bn3", affine=False)(x)
        return x


class _ProjHead(nn.Module):
    """One per-label head; variant selects the reference's v1..v4 stack."""

    in_dim: int
    proj_dim: int
    variant: str
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name, affine=True: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            use_bias=affine,
            use_scale=affine,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.bn_axis_name,
            name=name,
        )
        if self.variant == "v1":
            x = _dense(self.in_dim, False, "fc1", self.in_dim, self.dtype)(x)
            x = nn.relu(bn("bn1")(x))
            x = _dense(self.in_dim, False, "fc2", self.in_dim, self.dtype)(x)
            x = nn.relu(bn("bn2")(x))
            x = _dense(self.proj_dim, False, "fc3", self.in_dim, self.dtype)(x)
            x = bn("bn3", affine=False)(x)
        elif self.variant == "v2":
            x = _dense(self.in_dim, False, "fc1", self.in_dim, self.dtype)(x)
            x = nn.relu(bn("bn1")(x))
            x = _dense(self.proj_dim, False, "fc2", self.in_dim, self.dtype)(x)
            x = bn("bn2", affine=False)(x)
        elif self.variant == "v3":
            x = _dense(self.proj_dim, False, "fc1", self.in_dim, self.dtype)(x)
            x = bn("bn1", affine=False)(x)
        elif self.variant == "v4":
            x = _dense(self.proj_dim, True, "fc1", self.in_dim, self.dtype)(x)
        else:
            raise ValueError(f"unknown projector variant {self.variant!r}")
        return x


class MultiLabelProjector(nn.Module):
    """num_labels parallel heads; input (B, in_dim) -> (H, B, proj_dim).

    nn.vmap lifts the head axis: parameters get a leading (H,) dim (one
    stacked einsum instead of H small matmuls), batch stats likewise.
    """

    in_dim: int
    proj_dim: int
    num_labels: int = 8
    variant: str = "v4"
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.variant == "v0":
            # nn.Identity (mlc_train.py:352-353): single pseudo-head
            return x[None, :, :]
        vhead = nn.vmap(
            _ProjHead,
            in_axes=None,            # same input to every head
            out_axes=0,
            axis_size=self.num_labels,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
        )
        return vhead(
            self.in_dim, self.proj_dim, self.variant, self.dtype,
            self.bn_axis_name, name="heads",
        )(x, train)
