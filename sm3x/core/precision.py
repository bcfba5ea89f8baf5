"""Mixed-precision policy for TPU.

The reference uses fp16 autocast + GradScaler on CUDA
(/root/reference/tools/backbone_train.py:98,480). On TPU the idiomatic
equivalent is bfloat16 compute with float32 parameters and float32
batch-norm statistics — bf16 has fp32's exponent range so no loss scaler
is needed. The policy here controls the dtype convs/matmuls run in; the
optimizer state and params always stay fp32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy: params stored in `param_dtype`, compute in `compute_dtype`."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype used for loss/normalization reductions (always keep fp32)
    reduce_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_reduce(self, x):
        return jnp.asarray(x, self.reduce_dtype)


# bf16 compute everywhere (TPU AMP analogue of `--amp`)
DEFAULT_POLICY = Policy()
# strict fp32 (parity / debugging)
FP32_POLICY = Policy(compute_dtype=jnp.float32)


def policy_for(amp: bool) -> Policy:
    """Map the reference's `--amp` flag onto a TPU dtype policy."""
    return DEFAULT_POLICY if amp else FP32_POLICY
