"""ISIC transfer probe: the executable consumer of the single-image
datasets (reference src/utils/data/datasets.py:710-827 defines them; no
reference trainer consumes them — sm3x adds the probe the paper uses
them for)."""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sm3x.utils.checkpoint import save_checkpoint


def _make_isic17(root, n_train=10, n_test=6, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    for sub, csvname, n in (("ISIC-2017_Training_Data", "train_labels.csv",
                             n_train),
                            ("ISIC-2017_Test_v2_Data", "test_labels.csv",
                             n_test)):
        img_dir = root / sub
        img_dir.mkdir()
        with open(root / csvname, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["image_id", "melanoma", "seborrheic_keratosis"])
            for i in range(n):
                img = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
                Image.fromarray(img).save(img_dir / f"isic{i}.jpg")
                w.writerow([f"isic{i}", i % 2, (i + 1) % 2])


def _make_ssl_ckpt(path, arch="resnet18"):
    from sm3x.models.simclr import SimCLRSkinV3

    m = SimCLRSkinV3(arch=arch, proj_dim=16, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = m.init(jax.random.key(0), (x, x), (x, x), train=False)
    save_checkpoint(path, {"epoch": 0, "params": variables["params"],
                           "batch_stats": variables["batch_stats"]})


def test_transfer_probe_isic17(tmp_path):
    from sm3x.train.transfer_probe import run_transfer_probe

    _make_isic17(tmp_path)
    ckpt = str(tmp_path / "ckp_0.msgpack")
    _make_ssl_ckpt(ckpt)

    best = run_transfer_probe(
        ckpt, "ISIC17Dataset", str(tmp_path), arch="resnet18",
        modality="clinic", img_sz=(32, 32), batch_size=8, epochs=2,
        cache_size=48, workers=2)
    # 2 binary label columns -> per-column + AVG stats, all finite
    assert set(best) >= {"AUC_L0", "AUC_L1", "AUC_AVG", "loss"}
    for v in best.values():
        assert np.isfinite(v)
    assert 0.0 <= best["AUC_AVG"] <= 1.0


def test_transfer_probe_cli_rejects_bad_modality(tmp_path):
    from sm3x.train.transfer_probe import main

    with pytest.raises(SystemExit):
        main(["--pretrain-path", "x", "--data-path", "y",
              "--modality", "nope"])
