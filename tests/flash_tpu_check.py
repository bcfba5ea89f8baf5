"""Subprocess body for the TPU-gated flash-attention numerics lock
(tests/test_flash_tpu.py). Runs under the DEFAULT backend (axon TPU when
the tunnel is up — the in-process suite forces CPU, where the flash path
statically falls back, so the actual Pallas kernel is only exercisable
out-of-process). Exit codes: 0 = pass, 42 = no TPU backend (skip)."""

import sys

import numpy as np

import jax
import jax.numpy as jnp


def main():
    # default_backend() RAISES (not returns cpu) when the pinned axon
    # platform has no tunnel session (hermetic runs) — both the non-TPU
    # and the no-backend cases are the same skip
    try:
        backend = jax.default_backend()
    except RuntimeError as e:
        print(f"no usable backend ({e}); skipping")
        return 42
    if backend != "tpu":
        print(f"backend={backend}; skipping")
        return 42

    import flax.linen as nn

    from sm3x.models.vit import _flash_attention_fn

    # ViT-B SSL shapes: S=197 (196 patches + cls) exercises the padded
    # 256-token grid + segment-id masking; bf16 like the real model
    B, S, H, D = 8, 197, 12, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)

    def loss_flash(q, k, v):
        return jnp.sum(_flash_attention_fn(q, k, v).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            nn.dot_product_attention(q, k, v).astype(jnp.float32) ** 2)

    # forward parity (fp32 oracle on the same bf16 inputs)
    out_flash = jax.jit(_flash_attention_fn)(q, k, v)
    out_ref = jax.jit(nn.dot_product_attention)(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    fwd_err = float(jnp.max(jnp.abs(out_flash.astype(jnp.float32) - out_ref)))
    print(f"fwd max abs err: {fwd_err:.5f}")
    assert fwd_err < 0.02, f"fwd err {fwd_err} (bf16 ulp budget is ~0.008)"

    # gradient parity through the custom VJP (the kernel's backward
    # recomputes probs tile-wise — this locks dQ/dK/dV wiring + masking)
    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    for name, a, b in zip("qkv", gf, gr):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)
        print(f"d{name} rel err: {rel:.5f}")
        assert rel < 0.03, f"d{name} rel err {rel}"

    print("flash TPU numerics: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
