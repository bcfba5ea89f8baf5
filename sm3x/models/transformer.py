"""Post-LN transformer encoder layer with torch-parity semantics.

The MLC model mixes the 8 label tokens with one
`nn.TransformerEncoderLayer(d_model, nhead=1, dim_feedforward, dropout)`
(reference tools/mlc_train.py:63, batch_first=False, activation=relu,
norm_first=False). Exact semantics reproduced:

    a   = MHA(x, x, x)           # attn-weight dropout p
    x   = LN1(x + Dropout(a))
    f   = W2 @ Dropout(relu(W1 @ x + b1)) + b2
    x   = LN2(x + Dropout(f))

Input layout is (S, B, D) like the reference's stacked label tokens.
S=8: this is deliberately tiny — one fused MXU matmul chain, no need for
any attention kernel tricks.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from sm3x.models.projector import torch_linear_init


class MultiheadSelfAttention(nn.Module):
    """torch nn.MultiheadAttention (self-attention, batch_first=False).

    Parameters mirror torch's packed layout: `in_proj` Dense producing
    3*D (q,k,v packed), then `out_proj` Dense D->D.
    """

    d_model: int
    n_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        s, b, d = x.shape
        h = self.n_heads
        hd = d // h
        qkv = nn.Dense(
            3 * d, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros_init(),
            name="in_proj",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # (S, B, D) -> (B, H, S, hd)
        def heads(t):
            return t.reshape(s, b, h, hd).transpose(1, 2, 0, 3)
        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(2, 0, 1, 3).reshape(s, b, d)
        out = nn.Dense(
            d, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=torch_linear_init(d),
            bias_init=nn.initializers.zeros_init(),
            name="out_proj",
        )(out)
        return out


class TransformerEncoderLayer(nn.Module):
    d_model: int
    n_heads: int = 1
    dim_feedforward: int = 128
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        drop = lambda: nn.Dropout(self.dropout, deterministic=deterministic)
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        a = MultiheadSelfAttention(
            self.d_model, self.n_heads, self.dropout, self.dtype, name="self_attn"
        )(x, deterministic)
        x = ln("norm1")(x + drop()(a))
        f = nn.Dense(self.dim_feedforward, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=torch_linear_init(self.d_model),
                     bias_init=torch_linear_init(self.d_model),
                     name="linear1")(x)
        f = drop()(nn.relu(f))
        f = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=torch_linear_init(self.dim_feedforward),
                     bias_init=torch_linear_init(self.dim_feedforward),
                     name="linear2")(f)
        x = ln("norm2")(x + drop()(f))
        return x
