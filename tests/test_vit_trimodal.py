"""ViT backbone + tri-modal stretch model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sm3x.models.backbones import build_backbone, feat_dim
from sm3x.models.trimodal import TriModalSimCLR, trimodal_ssl_loss


def test_vit_forward_shapes():
    m = build_backbone("vit_t16", dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.key(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, feat_dim("vit_t16"))


@pytest.mark.parametrize("remat", [True, "dots", "attn", "flash", "mlp",
                                   "attn_mlp"])
def test_vit_remat_modes_grad_parity(remat):
    """Every rung of the activation-memory ladder (full-block remat,
    'dots' policy, checkpointed-attention 'attn', the fc1+gelu 'mlp'
    span, their union 'attn_mlp', and 'flash' — which on this CPU test
    mesh statically falls back to the 'attn' path) must be
    differentiable and produce the same gradients as the un-rematted ViT
    (remat changes scheduling, not math)."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)

    def grads(remat_mode):
        m = build_backbone("vit_t16", dtype=jnp.float32, remat=remat_mode)
        v = m.init(jax.random.key(0), x, train=False)

        def loss(p):
            return jnp.sum(m.apply({"params": p}, x, train=False) ** 2)

        return jax.jit(jax.grad(loss))(v["params"])

    g0 = grads(False)
    g1 = grads(remat)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_flash_padding_and_segment_mask():
    """The flash-attention wrapper pads S=197-style odd sequence lengths
    to the kernel's 128-token block grid and masks the padding with
    segment ids. Validated against the kernel's own pure-jnp oracle
    (`mha_reference` consumes the identical SegmentIds contract): padded
    + masked attention, sliced back, must equal direct unpadded attention.
    The Pallas kernel itself is numerics-checked on real TPU
    (BENCH.md round 3); this locks the padding/mask construction the
    kernel is fed."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    from sm3x.models.vit import _pad_for_flash

    b, s, h, d = 2, 197, 3, 8
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
               for _ in range(3))
    qp, kp, vp, seg, sp = _pad_for_flash(q, k, v)
    assert sp % fa.MIN_BLOCK_SIZE == 0 and qp.shape == (b, h, sp, d)
    assert np.asarray(seg).sum() == b * (sp - s)  # pads are segment 1

    import flax.linen as nn

    ref = nn.dot_product_attention(q, k, v)
    out = fa.mha_reference(qp, kp, vp, None,
                           segment_ids=fa.SegmentIds(seg, seg),
                           sm_scale=1.0 / np.sqrt(d))
    out = jnp.transpose(out[:, :, :s, :], (0, 2, 1, 3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_vit_branch_views_match_extract():
    """SimCLRBranch's per-view forward must agree with extract() on each
    view (guards the view plumbing; the round-3 fused-2B-pass variant was
    measured 0.78x and reverted — see SimCLRBranch.__call__)."""
    from sm3x.models.simclr import SimCLRBranch

    m = SimCLRBranch(arch="vit_t16", proj_dim=16, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(3, 32, 32, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(3, 32, 32, 3)), jnp.float32)
    v = m.init(jax.random.key(0), x1, x2, train=False)
    (f1, f2), z = m.apply(v, x1, x2, train=False)
    e1 = m.apply(v, x1, train=False, method=SimCLRBranch.extract)
    e2 = m.apply(v, x2, train=False, method=SimCLRBranch.extract)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(e1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(e2),
                               rtol=1e-5, atol=1e-5)
    assert z.shape == (6, 16)


def test_vit_in_simclr_branch():
    from sm3x.models.simclr import SimCLRSkinV3

    m = SimCLRSkinV3(arch="vit_t16", proj_dim=16, shared_cross_proj=False,
                     dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.key(0), (x, x), (x, x), train=False)
    out = m.apply(v, (x, x), (x, x), train=False)
    assert out["derm_z"].shape == (4, 16)


def test_trimodal_forward_and_loss():
    m = TriModalSimCLR(arch="vit_t16", proj_dim=16,
                       meta_vocab_sizes=(3, 3, 5), meta_feat_dim=32,
                       dtype=jnp.float32)
    b = 4
    x = jnp.asarray(np.random.default_rng(0).normal(size=(b, 32, 32, 3)),
                    jnp.float32)
    codes = jnp.asarray(np.random.default_rng(1).integers(0, 3, (b, 3)),
                        jnp.int32)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    v = m.init(rngs, (x, x), (x, x), codes, train=False)
    out, _ = m.apply(v, (x, x), (x, x), codes, train=True,
                     rngs={"dropout": jax.random.key(2)},
                     mutable=["batch_stats"])
    assert out["cross_meta_z"][0].shape == (b, 16)
    total, parts = trimodal_ssl_loss(out, temperature=0.1)
    for k in ("derm", "clinic", "meta", "cross"):
        assert np.isfinite(float(parts[k])), k
    assert np.isfinite(float(total))


def test_trimodal_loss_learns():
    """One gradient step reduces the tri-modal loss on a fixed batch."""
    import optax

    m = TriModalSimCLR(arch="vit_t16", proj_dim=8,
                       meta_vocab_sizes=(3, 3, 5), meta_feat_dim=16,
                       dtype=jnp.float32)
    b = 4
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(b, 32, 32, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(b, 32, 32, 3)), jnp.float32)
    codes = jnp.asarray(rng.integers(0, 3, (b, 3)), jnp.int32)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = m.init(rngs, (x1, x2), (x1, x2), codes, train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, stats):
        def loss_fn(p):
            out, mut = m.apply(
                {"params": p, "batch_stats": stats},
                (x1, x2), (x1, x2), codes, train=True,
                rngs={"dropout": jax.random.key(3)}, mutable=["batch_stats"])
            total, _ = trimodal_ssl_loss(out, 0.1)
            return total, mut["batch_stats"]

        (l, new_stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, updates), opt2, new_stats, l

    losses = []
    for _ in range(4):
        params, opt, stats, l = step(params, opt, stats)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses


def test_trimodal_trainer_cli_reachable(tmp_path):
    """--arch-version trimodal wires the full SSL trainer: metadata codes
    flow from the dataset batches into the tri-modal step, the loss has
    the meta/cross parts, and it trains (round-2: the stretch model is
    now trainer/CLI-reachable, not just a module)."""
    import numpy as np

    from sm3x.core.config import (SSLConfig, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from sm3x.data.datasets import build_dataset
    from sm3x.data.synthetic import make_fake_derm7pt
    from sm3x.train.backbone_train import SSLTrainer

    root = str(tmp_path / "data")
    make_fake_derm7pt(root, n_cases=8, img_size=56)
    data = build_dataset("SevenPCBaseDataset", root, "train", cache_size=64)
    assert data.meta_codes is not None and data.meta_codes.shape[1] == 3
    sizes = tuple(data.meta_vocab_sizes)

    cfg = SSLConfig(
        data=DataConfig(img_sz=(32, 32)),
        model=ModelConfig(arch="resnet18", arch_version="trimodal",
                          proj_dim=16, temperature=0.1,
                          meta_vocab_sizes=sizes),
        optim=OptimConfig(epochs=1, batch_size=8, base_lr=1e-3, amp=False),
        run=RunConfig(log_path=str(tmp_path), seed=0, world_size=2,
                      save_freq=100, ckpt_freq=100),
    )
    t = SSLTrainer(cfg)
    assert t.is_trimodal
    stat0 = t.train_epoch(data, 0)
    assert np.isfinite(stat0["loss"])

    # batches carry per-sample meta codes (and DeviceData passes them on)
    b = next(iter(data.batches(8)))
    assert b.meta.shape == (8, 3)
