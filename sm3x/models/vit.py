"""Vision Transformer backbones (the BASELINE.json stretch goal:
"ViT-B/16 dual-branch ... large-batch contrastive").

Standard pre-LN ViT (patch embed -> [cls] + pos embed -> N x (LN-MHA-add,
LN-MLP(gelu)-add) -> final LN -> cls feature), TPU-first: bf16 compute /
fp32 params, optional per-block remat, all matmul shapes MXU-aligned for
the /16 patch sizes at 224 (196+1 tokens).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from sm3x.models.projector import torch_linear_init


def _remat_attention_fn(query, key, value, mask=None, dtype=None,
                        precision=None, force_fp32_for_softmax=False):
    """`nn.dot_product_attention` under `jax.checkpoint`: the backward
    recomputes the (B, H, S, S) attention probs from q/k instead of
    reading them from a saved fwd residual — the probs tensors are what
    drive the ViT b=128 activation-HBM collapse (BENCH.md round 3), and
    recomputing them costs ~4% of block FLOPs at S=197."""
    inner = functools.partial(
        nn.dot_product_attention, mask=mask, dtype=dtype, precision=precision,
        force_fp32_for_softmax=force_fp32_for_softmax)
    return jax.checkpoint(inner)(query, key, value)


def _pad_for_flash(query, key, value):
    """(B, S, H, D) flax layout -> padded (B, H, Sp, D) kernel layout plus
    the (B, Sp) segment ids that mask the padding.

    The Pallas TPU flash kernel tiles the sequence in MIN_BLOCK_SIZE (128)
    blocks, so S=197 (224^2 /16 patches + [cls]) pads to 256; padded
    tokens get segment id 1 vs the real tokens' 0, so they only attend to
    each other (SegmentIds masks q_seg != kv_seg) and their output rows
    are sliced away by the caller. Attention is ~4% of ViT-B block FLOPs
    at S=197, so the (256/197)^2 dot padding costs ~3% of the step's
    attention slice."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, s, _, _ = query.shape
    sp = -(-s // fa.MIN_BLOCK_SIZE) * fa.MIN_BLOCK_SIZE

    def to_bhsd(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        return jnp.pad(x, ((0, 0), (0, 0), (0, sp - s), (0, 0)))

    seg = jnp.broadcast_to(
        (jnp.arange(sp) >= s).astype(jnp.int32)[None, :], (b, sp))
    return to_bhsd(query), to_bhsd(key), to_bhsd(value), seg, sp


def _flash_attention_fn(query, key, value, mask=None, dtype=None,
                        precision=None, force_fp32_for_softmax=False):
    """Fused Pallas flash-attention (TPU): softmax(QK^T/sqrt(D))V computed
    tile-wise in VMEM — the probs never touch HBM in either direction
    (the custom VJP recomputes them per tile), the strongest point on the
    attention-memory ladder. Off-TPU (CPU test mesh) this statically
    falls back to the checkpointed XLA path, which has identical
    save-nothing residual semantics (the backend decision must not
    inspect the runtime arrays: under jit they are Tracers)."""
    if jax.default_backend() != "tpu":
        return _remat_attention_fn(
            query, key, value, mask=mask, dtype=dtype, precision=precision,
            force_fp32_for_softmax=force_fp32_for_softmax)
    if mask is not None:
        # the Pallas kernel only expresses masking via segment ids; a
        # caller-provided mask would be silently dropped on TPU while the
        # CPU fallback honors it — refuse rather than diverge (ADVICE r3)
        raise NotImplementedError(
            "flash attention does not support an attention mask; use "
            "remat='attn' for masked attention")
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, s, h, d = query.shape
    q, k, v, seg, _ = _pad_for_flash(query, key, value)
    out = fa.flash_attention(q, k, v, segment_ids=fa.SegmentIds(seg, seg),
                             sm_scale=1.0 / math.sqrt(d))
    return jnp.transpose(out[:, :, :s, :], (0, 2, 1, 3)).astype(query.dtype)


_ATTENTION_FNS = {
    "xla": nn.dot_product_attention,
    "attn": _remat_attention_fn,
    "flash": _flash_attention_fn,
}


class ViTBlock(nn.Module):
    dim: int
    n_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16
    attn_impl: str = "xla"  # "xla" | "attn" (checkpointed) | "flash"
    mlp_remat: bool = False  # remat the ln2+fc1+gelu span (see mlp_in)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)
        h = ln("ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype, param_dtype=jnp.float32,
            attention_fn=_ATTENTION_FNS[self.attn_impl],
            name="attn")(h, h)
        x = x + h
        hidden = int(self.dim * self.mlp_ratio)

        def mlp_in(blk, t):
            # ln2 + fc1 + gelu as one module-first span so `nn.remat` can
            # wrap exactly it (explicit names keep the param tree at
            # block*/ln2 + block*/fc1 in every mode). Rematting it saves
            # ONLY `t` — the residual-stream tensor that is live anyway —
            # and frees three per-block residuals: the ln2 output (fc1's
            # backward input) and both wide bf16[B, S, 4*dim] MLP hiddens
            # (the fc1 output needed by gelu's backward and the gelu
            # output needed by fc2's backward) — the measured driver of
            # the ViT b=128 HBM collapse (BENCH.md round 4 finding 3).
            # Recompute cost: one LN + fc1 matmul + gelu ≈ 1/3 of block
            # forward FLOPs.
            t = nn.LayerNorm(epsilon=1e-6, dtype=blk.dtype,
                             param_dtype=jnp.float32, name="ln2")(t)
            t = nn.Dense(hidden, dtype=blk.dtype, param_dtype=jnp.float32,
                         kernel_init=torch_linear_init(blk.dim),
                         name="fc1")(t)
            return nn.gelu(t)

        mlp_fn = nn.remat(mlp_in) if self.mlp_remat else mlp_in
        h = mlp_fn(self, x)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=torch_linear_init(hidden), name="fc2")(h)
        return x + h


class ViT(nn.Module):
    patch: int = 16
    dim: int = 768
    depth: int = 12
    n_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: Optional[int] = None
    dtype: Any = jnp.bfloat16
    # Activation-memory strategy ladder (all checkpoint-compatible —
    # the param tree is identical across modes):
    #   False  — save everything (XLA default residuals)
    #   True   — full per-block remat
    #   "dots" — selective policy remat: save weight-matmul outputs,
    #            recompute attention dots + elementwise (measured: pins
    #            the 4x-wide fc1 outputs and compile-OOMs at b=128)
    #   "attn" — recompute ONLY the attention internals in the backward
    #            (jax.checkpoint around softmax(QK^T)V): frees the
    #            (B, heads, S, S) probs residuals that cause the b=128
    #            activation-HBM collapse at ~4% block-FLOP recompute
    #   "flash"— same save-nothing attention residuals via the fused
    #            Pallas flash-attention kernel (probs never reach HBM in
    #            fwd OR bwd; tile-wise recompute in VMEM). TPU only;
    #            falls back to "attn" semantics on other backends.
    #   "mlp"  — recompute the ln2+fc1+gelu span in the backward: frees
    #            the ln2 output and the two wide bf16[B, S, 4*dim] MLP
    #            hidden residuals (the measured driver of the b=128
    #            collapse, BENCH.md round 4 finding 3) at ~1/3
    #            block-forward-FLOP recompute
    #   "attn_mlp" — both of the above: checkpointed attention + fc1/gelu
    #            remat; the targeted answer to large-batch HBM pressure
    remat: Union[bool, str] = False
    bn_axis_name: Optional[str] = None  # unused (no BN); registry-compatible

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, -1, self.dim)
        n_tokens = x.shape[1] + 1
        cls = self.param("cls", nn.initializers.normal(0.02), (1, 1, self.dim),
                         jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)).astype(x.dtype), x], axis=1)
        # pos_embed is created at the FIRST grid size this module is
        # initialized with; other input resolutions (SwAV multi-crop local
        # views, transfer eval at a different size) bilinearly interpolate
        # its 2D grid part — standard ViT practice. The init grid is
        # recovered from the stored param's own shape (square grids; a
        # non-square init grid keeps the fixed-size behavior). The resize
        # is a tiny whole-param op with static shapes per jit
        # specialization, so it costs nothing per step.
        h0, w0 = gh, gw
        if not self.is_initializing():
            stored = self.get_variable("params", "pos_embed")
            if stored is not None:
                n0 = stored.shape[1] - 1
                r = math.isqrt(n0)
                if r * r == n0:
                    h0, w0 = r, r
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, h0 * w0 + 1, self.dim), jnp.float32)
        if (h0, w0) != (gh, gw):
            grid = pos[:, 1:].reshape(1, h0, w0, self.dim)
            grid = jax.image.resize(grid, (1, gh, gw, self.dim), "bilinear")
            pos = jnp.concatenate(
                [pos[:, :1], grid.reshape(1, gh * gw, self.dim)], axis=1)
        x = x + pos.astype(x.dtype)

        if not isinstance(self.remat, bool) and self.remat not in (
                "dots", "attn", "flash", "mlp", "attn_mlp"):
            # a typo ('flsh', 'atn') must not silently run full per-block
            # remat via the truthy elif below (ADVICE r3)
            raise ValueError(
                f"unknown remat/--use-checkpoint mode {self.remat!r}; "
                f"valid: False, True, 'dots', 'attn', 'flash', 'mlp', "
                f"'attn_mlp'")
        block_cls = ViTBlock
        attn_impl = "xla"
        mlp_remat = False
        if self.remat in ("attn", "flash"):
            attn_impl = self.remat
        elif self.remat in ("mlp", "attn_mlp"):
            mlp_remat = True
            if self.remat == "attn_mlp":
                attn_impl = "attn"
        elif self.remat:
            policy = None
            if self.remat == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            block_cls = nn.remat(ViTBlock, static_argnums=(2,), policy=policy)
        for i in range(self.depth):
            x = block_cls(self.dim, self.n_heads, self.mlp_ratio, self.dtype,
                          attn_impl, mlp_remat, name=f"block{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="ln_final")(x)
        feat = x[:, 0].astype(jnp.float32)
        if self.num_classes is not None:
            feat = nn.Dense(self.num_classes, param_dtype=jnp.float32,
                            name="fc")(feat)
        return feat


VIT_SPECS = {
    "vit_t16": dict(patch=16, dim=192, depth=12, n_heads=3),
    "vit_s16": dict(patch=16, dim=384, depth=12, n_heads=6),
    "vit_b16": dict(patch=16, dim=768, depth=12, n_heads=12),
    "vit_l16": dict(patch=16, dim=1024, depth=24, n_heads=16),
}

VIT_FEAT_DIMS = {k: v["dim"] for k, v in VIT_SPECS.items()}


def build_vit(arch: str, num_classes: Optional[int] = None,
              dtype=jnp.bfloat16, bn_axis_name=None,
              remat: Union[bool, str] = False) -> ViT:
    spec = VIT_SPECS[arch]
    return ViT(num_classes=num_classes, dtype=dtype, remat=remat, **spec)
