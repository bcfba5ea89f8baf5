#!/usr/bin/env python
"""Capability demo: the full SM3 pipeline learns on synthetic
label-correlated data.

Builds a synthetic paired dataset whose image statistics encode the
labels (per-class hue/texture), runs stage-1 SSL pretraining, then
linear-probes the frozen features and compares against a probe on a
RANDOM-INIT extractor. SSL features beating random-init features on val
AUC demonstrates the contrastive pipeline end-to-end without the
(non-redistributable) Derm7pt images.

    python tools/demo_synthetic_e2e.py --epochs 20
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_structured_dataset(n=192, size=160, seed=0):
    """Paired images whose hue/frequency encode the 8 labels.

    n=192 is the historical demo size (BENCH.md tables); larger n
    raises steps-per-epoch, needed for a meaningful --bn-stat-freq K>1
    grid (K >= steps_per_epoch collapses to once-per-epoch refresh)."""
    import cv2

    from sm3x import NUM_CLASSES
    from sm3x.data.pipeline import PairedImageData

    rng = np.random.default_rng(seed)
    labels = np.stack([rng.integers(0, c, n) for c in NUM_CLASSES], axis=1)
    # synthetic patient metadata for the trimodal stretch path: codes
    # correlated with the first three labels (Derm7pt-like cardinalities
    # elevation/sex/location = 3/3/16) with 15% random corruption, so the
    # metadata branch carries real but imperfect label evidence
    meta_vocab = (3, 3, 16)
    meta = np.stack([labels[:, 0] % 3, labels[:, 1] % 3,
                     labels[:, 4] % 16], axis=1).astype(np.int32)
    noise_mask = rng.random(meta.shape) < 0.15
    noise_vals = np.stack([rng.integers(0, v, n) for v in meta_vocab],
                          axis=1).astype(np.int32)
    meta = np.where(noise_mask, noise_vals, meta)

    def render(label, modality_shift):
        # label-correlated luminance texture (the shared generator also
        # backs recipe-scale make_fake_derm7pt(structured=True) runs);
        # same rng-call sequence as the historical in-file renderer, so
        # the BENCH.md demo numbers stay reproducible
        from sm3x.data.synthetic import render_label_texture

        return render_label_texture(rng, label, modality_shift, size)

    class ArrayStore:
        pass

    def build(split_idx):
        from sm3x.data.pipeline import letterbox

        derm = ArrayStore()
        clinic = ArrayStore()
        for store, shift in ((derm, 0.0), (clinic, 0.07)):
            canv = np.zeros((len(split_idx), size, size, 3), np.uint8)
            hw = np.zeros((len(split_idx), 2), np.int32)
            for j, i in enumerate(split_idx):
                canv[j] = render(labels[i], shift)
                hw[j] = (size, size)
            store.canvases = canv
            store.valid_hw = hw
        data = PairedImageData.__new__(PairedImageData)
        data.derm = derm
        data.clinic = clinic
        data.labels = labels[split_idx].astype(np.int32)
        data.n = len(split_idx)
        data.meta_codes = meta[split_idx]
        data.meta_vocab_sizes = list(meta_vocab)
        return data

    perm = rng.permutation(n)
    n_tr = int(n * 0.7)
    return build(perm[:n_tr]), build(perm[n_tr:])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=48)
    p.add_argument("--probe-epochs", type=int, default=15)
    p.add_argument("--arch", default="resnet18")
    p.add_argument("--img-sz", type=int, default=96)
    p.add_argument("--log-path", default="/tmp/sm3x_demo")
    p.add_argument("--full-pipeline", action="store_true",
                   help="also run stage-2 DeepCluster + supervised eval")
    p.add_argument("--mlc-epochs", type=int, default=40)
    p.add_argument("--eval-epochs", type=int, default=25)
    p.add_argument("--bn-stat-freq", type=int, default=1,
                   help="run the SSL stage with the off-recipe periodic "
                   "BN-stat refresh (learnability check for the lever)")
    p.add_argument("--lr", type=float, default=1e-3,
                   help="SSL learning rate (the BN-stat-freq lever's "
                   "safety depends on how fast params outrun the EMA)")
    p.add_argument("--arch-version", default="v32",
                   help="SSL model family (v2/v3/v32 styles or 'trimodal' "
                   "for the metadata third-modality stretch path)")
    p.add_argument("--use-checkpoint", default="false",
                   help="ViT attention-memory ladder rung: false|true|"
                   "dots|attn|flash|mlp|attn_mlp (models/vit.py)")
    p.add_argument("--data-n", type=int, default=192,
                   help="synthetic dataset size (70/30 train/val split); "
                   "default matches the historical BENCH.md tables")
    p.add_argument("--multicrop", action="store_true",
                   help="SwAV-style multi-crop SSL (SevenPCSwavDataset "
                   "semantics): 2 globals at --img-sz + 4 locals at half "
                   "resolution")
    args = p.parse_args()
    use_ckpt = {"false": False, "true": True}.get(
        args.use_checkpoint.lower(), args.use_checkpoint)

    from sm3x.core.config import SSLConfig, DataConfig, ModelConfig, OptimConfig, RunConfig
    from sm3x.train.backbone_train import SSLTrainer
    from sm3x.train.linear_probe import LinearProbe, make_ssl_extract_fn

    mean = (0.5, 0.5, 0.5)
    std = (0.25, 0.25, 0.25)
    train, test = make_structured_dataset(n=args.data_n)
    print(f"data: train {train.n} / test {test.n}", flush=True)

    dkw = dict(img_sz=(args.img_sz, args.img_sz), mean=mean, std=std)
    if args.multicrop:
        # SwAV recipe scaled to the demo resolution: 2 globals + 4 locals
        # at half size (the reference's 224/96 ratio, datasets.py:608-707)
        dkw.update(data_name="SevenPCSwavDataset",
                   size_crops=(args.img_sz, args.img_sz // 2),
                   nmb_crops=(2, 4),
                   min_scale_crops=(0.5, 0.14),
                   max_scale_crops=(1.0, 0.5))
    cfg = SSLConfig(
        data=DataConfig(**dkw),
        model=ModelConfig(arch=args.arch, arch_version=args.arch_version,
                          proj_dim=64, temperature=0.1,
                          bn_stat_freq=args.bn_stat_freq,
                          use_checkpoint=use_ckpt,
                          meta_vocab_sizes=(3, 3, 16)),
        optim=OptimConfig(epochs=args.epochs, batch_size=args.batch_size,
                          base_lr=args.lr, amp=True),
        run=RunConfig(log_path=args.log_path, seed=0, save_freq=1000,
                      ckpt_freq=1000, print_freq=1000),
    )

    def probe_auc(trainer, tag):
        extract = make_ssl_extract_fn(
            trainer.model, trainer.state, trainer.mesh, mean, std,
            (args.img_sz, args.img_sz))
        from sm3x.models.backbones import feat_dim

        probe = LinearProbe(2 * feat_dim(args.arch), ft_lr=1e-3, seed=0,
                            mesh=trainer.mesh)
        best = probe.run(extract, train, test, args.batch_size,
                         epochs=args.probe_epochs)
        print(f"{tag}: best val AUC_AVG {best['AUC_AVG']:.4f}", flush=True)
        return best["AUC_AVG"]

    t0 = time.time()
    trainer = SSLTrainer(cfg)
    auc_random = probe_auc(trainer, "random-init probe")
    trainer.fit(train)
    print(f"SSL {args.epochs} epochs in {(time.time() - t0) / 60:.1f} min",
          flush=True)
    auc_ssl = probe_auc(trainer, "SSL-pretrained probe")
    print(f"RESULT: ssl {auc_ssl:.4f} vs random {auc_random:.4f} "
          f"({'PASS' if auc_ssl > auc_random else 'FAIL'})", flush=True)

    if args.full_pipeline:
        import jax

        from sm3x.core.config import MLCTrainConfig, EvalConfig
        from sm3x.train.mlc_train import MLCTrainer
        from sm3x.train.mlc_eval import MLCEvalTrainer

        ssl_params = jax.device_get(trainer.state.params)
        ssl_stats = jax.device_get(trainer.state.batch_stats)
        mcfg = MLCTrainConfig(
            data=cfg.data,
            model=ModelConfig(arch=args.arch, mlc_proj="v4", mlc_proj_dim=128,
                              num_heads=1, sa_dim_ff=64, sa_dropout=0.1,
                              temperature=1.0),
            optim=OptimConfig(epochs=args.mlc_epochs,
                              batch_size=args.batch_size, base_lr=1e-4,
                              amp=True),
            run=RunConfig(log_path=args.log_path + "/mlc", seed=0,
                          save_freq=10000, ckpt_freq=10000, print_freq=1000),
            kmeans_iters=10,
        )
        t0 = time.time()
        mlc = MLCTrainer(mcfg, mesh=trainer.mesh,
                         extractor_tree=(ssl_params, ssl_stats))
        mlc.fit(train)
        print(f"MLC {args.mlc_epochs} epochs in "
              f"{(time.time() - t0) / 60:.1f} min", flush=True)

        ecfg = EvalConfig(
            data=cfg.data,
            model=ModelConfig(arch=args.arch, mlc_proj="v4", mlc_proj_dim=128,
                              num_heads=1, sa_dim_ff=64, sa_dropout=0.1,
                              finetune="projector"),
            optim=OptimConfig(epochs=args.eval_epochs,
                              batch_size=args.batch_size, base_lr=1e-3,
                              amp=True),
            run=RunConfig(log_path=args.log_path + "/eval", seed=0,
                          print_freq=1000),
            train_sz=args.img_sz, test_sz=args.img_sz,
        )
        mlc_params = jax.device_get(mlc.state.params)
        mlc_stats = jax.device_get(mlc.state.batch_stats)
        ev = MLCEvalTrainer(ecfg, mesh=trainer.mesh,
                            pretrained_tree=(mlc_params, mlc_stats))
        best = ev.fit(train, test)
        print(f"FULL-PIPELINE RESULT: supervised eval best AUC {best:.4f} "
              f"vs linear probe {auc_ssl:.4f} vs random {auc_random:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
