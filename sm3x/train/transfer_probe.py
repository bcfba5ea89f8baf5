"""Transfer linear probe: ONE pretrained modality encoder over a
single-image dataset (the ISIC wrappers).

The reference defines the ISIC dataset classes
(src/utils/data/datasets.py:710-827) but ships no trainer that consumes
them — their purpose in the paper is transfer evaluation of a pretrained
backbone. This module is that consumer: load a stage-1 SSL checkpoint
(sm3x msgpack or reference-convention `.pth`), take the derm or clinic
encoder, freeze it, and linear-probe the dataset's binary label columns
(each a 2-class head, positive class = column value 1).

TPU design mirrors sm3x.train.linear_probe: the frozen encoder runs
forward-only once per epoch-transform draw (no backward), the probe heads
train on the features, everything jitted over the ("data","model") mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sm3x.core.mesh import make_mesh, replicate, shard_batch
from sm3x.models import backbones
from sm3x.ops.augment import PROBE_AUG, eval_resize_batch, ssl_augment_batch
from sm3x.train.linear_probe import LinearProbe
from sm3x.utils import setup_logger

# ISIC images are natural photographs — ImageNet statistics, not the
# Derm7pt-specific means the paired trainers default to.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass
class SingleBatch:
    """Batch shape LinearProbe.run consumes (.label/.mask) plus the
    single-modality payload the extract fn reads."""

    image: np.ndarray       # (B, S, S, 3) uint8 canvases
    image_hw: np.ndarray    # (B, 2) int32 valid sizes
    label: np.ndarray       # (B, L) int32 binary columns
    index: np.ndarray
    mask: np.ndarray


class SingleProbeData:
    """Adapts SingleImageData's tuple batches to SingleBatch objects."""

    def __init__(self, data):
        self.data = data
        self.n = data.n
        self.num_labels = data.labels.shape[1]

    def batches(self, batch_size: int, epoch: int = 0, seed: int = 3407,
                shuffle: bool = True):
        for canv, hw, labels, idx, mask in self.data.batches(
                batch_size, epoch, seed, shuffle):
            yield SingleBatch(canv, hw, labels, idx, mask)


def make_single_extract_fn(encoder, params, batch_stats, mesh, mean, std,
                           img_sz=(224, 224), train_aug=PROBE_AUG):
    """Frozen single-encoder feature fn (cf. make_ssl_extract_fn, which
    concatenates both modality encoders for the paired probe)."""
    aug = dataclasses.replace(train_aug, out_size=tuple(img_sz))
    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def feats_train(img, img_hw, rng):
        x = ssl_augment_batch(rng, img, img_hw, mean, std, aug)
        return encoder.apply(variables, x, False)

    @jax.jit
    def feats_eval(img, img_hw):
        x = eval_resize_batch(img, img_hw, mean, std, tuple(img_sz))
        return encoder.apply(variables, x, False)

    def extract(batch, rng, train: bool):
        db = shard_batch(mesh, {"image": batch.image,
                                "image_hw": batch.image_hw})
        if train:
            return feats_train(db["image"], db["image_hw"], rng)
        return feats_eval(db["image"], db["image_hw"])

    return extract


def load_single_encoder(pretrain_path: str, arch: str, modality: str,
                        mesh=None):
    """Bare encoder module + its weights from a stage-1 SSL checkpoint
    (msgpack or torch `.pth` in the reference key conventions), picking
    the `derm`/`clinic` branch (reference tree: {derm,clinic}_backbone
    .encoder, tools/mlc_train.py:341-346's boot surgery source)."""
    from sm3x.cli.apps import load_extractor_tree

    mesh = mesh or make_mesh()
    params, batch_stats = load_extractor_tree(pretrain_path, arch)
    mod = {"derm": "derm_backbone", "clinic": "clinic_backbone"}[modality]
    encoder = backbones.build_backbone(arch)
    enc_params = replicate(mesh, params[mod]["encoder"])
    enc_stats = replicate(mesh, batch_stats[mod]["encoder"])
    return encoder, enc_params, enc_stats, mesh


def run_transfer_probe(pretrain_path: str, data_name: str, data_path: str,
                       arch: str = "resnet50", modality: str = "derm",
                       img_sz=(224, 224), batch_size: int = 64,
                       epochs: int = 50, ft_lr: float = 1e-3,
                       wd: float = 5e-2, seed: int = 3407,
                       mean: Sequence[float] = IMAGENET_MEAN,
                       std: Sequence[float] = IMAGENET_STD,
                       cache_size: int = 320, workers: int = 8,
                       logger=None, mesh=None):
    """Probe `pretrain_path`'s `modality` encoder on an ISIC-style
    dataset; returns the best val stats dict (AUC_AVG selection, as the
    paired probe)."""
    from sm3x.data.datasets import build_dataset

    logger = logger or setup_logger(None, "sm3x.transfer")
    encoder, enc_params, enc_stats, mesh = load_single_encoder(
        pretrain_path, arch, modality, mesh)
    train = SingleProbeData(build_dataset(data_name, data_path, "train",
                                          cache_size=cache_size,
                                          workers=workers))
    test = SingleProbeData(build_dataset(data_name, data_path, "test",
                                         cache_size=cache_size,
                                         workers=workers))
    if train.num_labels != test.num_labels:
        raise ValueError(f"train has {train.num_labels} label columns, "
                         f"test {test.num_labels}")
    ncols = train.num_labels
    extract = make_single_extract_fn(encoder, enc_params, enc_stats, mesh,
                                     tuple(mean), tuple(std), tuple(img_sz))
    probe = LinearProbe(
        backbones.feat_dim(arch), ft_lr=ft_lr, wd=wd,
        num_classes=(2,) * ncols, seed=seed, mesh=mesh,
        # binary columns: positive class is index 1
        classes_name=tuple(f"L{i}" for i in range(ncols)),
        cls_weights=(1,) * ncols)
    logger.info(f"transfer probe: {modality} {arch} encoder from "
                f"{pretrain_path} on {data_name} ({train.n} train / "
                f"{test.n} test, {ncols} binary labels)")
    best = probe.run(extract, train, test, batch_size, epochs=epochs,
                     label_weights=(1.0,) * ncols, seed=seed, logger=logger)
    logger.info(f"transfer probe best val AUC_AVG: {best['AUC_AVG']:.4f}")
    return best


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Linear-probe one SSL-pretrained modality encoder on "
        "an ISIC-style single-image dataset")
    p.add_argument("--pretrain-path", required=True,
                   help="stage-1 SSL checkpoint (.msgpack or .pth)")
    p.add_argument("--data-name", default="ISIC17Dataset")
    p.add_argument("--data-path", required=True)
    p.add_argument("-a", "--arch", default="resnet50")
    p.add_argument("--modality", default="derm", choices=("derm", "clinic"))
    p.add_argument("--img-sz", nargs=2, type=int, default=[224, 224])
    p.add_argument("-b", "--batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--ft-lr", type=float, default=1e-3)
    p.add_argument("--wd", type=float, default=5e-2)
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--mean", nargs=3, type=float, default=list(IMAGENET_MEAN))
    p.add_argument("--std", nargs=3, type=float, default=list(IMAGENET_STD))
    p.add_argument("--cache-size", type=int, default=320)
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args(argv)

    from sm3x.core.cache import enable_compilation_cache

    enable_compilation_cache()
    best = run_transfer_probe(
        args.pretrain_path, args.data_name, args.data_path, args.arch,
        args.modality, tuple(args.img_sz), args.batch_size, args.epochs,
        args.ft_lr, args.wd, args.seed, tuple(args.mean), tuple(args.std),
        args.cache_size, args.workers)
    print({k: round(v, 4) for k, v in best.items()})


if __name__ == "__main__":
    main()
