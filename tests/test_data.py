"""Data layer: schema mapping, splits, canvas cache, batching, augmentation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sm3x.data.derm7pt import (
    Derm7ptMeta, GROUPED_SCHEMA, FULL_SCHEMA, LABEL_ORD, strings2numeric,
)
from sm3x.data.synthetic import make_fake_derm7pt, synthetic_canvas_batch
from sm3x.data.pipeline import PairedImageData
from sm3x.ops.augment import (
    ssl_augment_batch, eval_resize_batch, SSL_AUG, FINETUNE_AUG,
)

MEAN = (0.7833, 0.6712, 0.6026)
STD = (0.2139, 0.2472, 0.2571)


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("7pc")
    return make_fake_derm7pt(str(root), n_cases=16, img_size=96)


def test_grouped_schema_num_classes():
    assert [GROUPED_SCHEMA[a].n_classes for a in LABEL_ORD] == [5, 3, 2, 3, 3, 3, 3, 2]
    assert [FULL_SCHEMA[a].n_classes for a in LABEL_ORD] == [15, 3, 2, 8, 5, 3, 3, 4]


def test_strings2numeric_groups_and_errors():
    cat = GROUPED_SCHEMA["DIAG"]
    out = strings2numeric(
        ["clark nevus", "melanoma (in situ)", "seborrheic keratosis"], cat)
    assert out.tolist() == [1, 2, 4]
    with pytest.raises(ValueError):
        strings2numeric(["not a lesion"], cat)


def test_meta_and_store(fake_root):
    meta = Derm7ptMeta(fake_root)
    assert meta.labels.shape[1] == 8
    assert meta.num_classes() == [5, 3, 2, 3, 3, 3, 3, 2]
    data = PairedImageData.from_meta(meta, "train", cache_size=128)
    assert data.derm.canvases.dtype == np.uint8
    assert data.derm.canvases.shape[1:] == (128, 128, 3)
    # border crop of 25px: valid region <= original - 50, letterboxed
    assert np.all(data.derm.valid_hw <= 128)
    assert np.all(data.derm.valid_hw > 0)


def test_fake_derm7pt_structured_splits_jpg(tmp_path):
    """Recipe-scale generator options: explicit reference-style split
    sizes, label-correlated texture images, JPEG container (native-loader
    decode path). The texture must carry label signal: images of the
    same DIAG class correlate more than images of different classes."""
    root = make_fake_derm7pt(str(tmp_path / "d"), n_cases=20, img_size=96,
                             splits=(9, 4, 7), structured=True, ext="jpg")
    meta = Derm7ptMeta(root)
    assert [len(meta.split_indexes(s)) for s in ("train", "valid", "test")] \
        == [9, 4, 7]
    assert meta.derm_paths[0].endswith(".jpg")
    data = PairedImageData.from_meta(meta, "train", cache_size=64)
    assert data.n == 9
    # structured images are not uniform noise: grayscale textures have
    # strong spatial autocorrelation (noise images have ~none)
    img = data.derm.canvases[0].astype(np.float32)
    h = int(data.derm.valid_hw[0, 0])
    col = img[: h - 1, 0, 0] - img[: h - 1, 0, 0].mean()
    col_next = img[1:h, 0, 0] - img[1:h, 0, 0].mean()
    r = float((col * col_next).sum()
              / np.sqrt((col ** 2).sum() * (col_next ** 2).sum() + 1e-9))
    assert r > 0.5, f"structured image should be spatially correlated, r={r}"
    with pytest.raises(ValueError):
        make_fake_derm7pt(str(tmp_path / "bad"), n_cases=10, splits=(5, 4, 3))


def test_batches_fixed_shape_and_mask(fake_root):
    meta = Derm7ptMeta(fake_root)
    data = PairedImageData.from_meta(meta, "train", cache_size=64)
    bs = 5
    batches = list(data.batches(bs, epoch=0))
    assert all(b.derm.shape[0] == bs for b in batches)
    n_valid = sum(int(b.mask.sum()) for b in batches)
    assert n_valid == data.n
    # shuffling is deterministic per epoch
    o1 = data.epoch_order(3)
    o2 = data.epoch_order(3)
    o3 = data.epoch_order(4)
    assert np.array_equal(o1, o2) and not np.array_equal(o1, o3)


def test_ssl_augment_shapes_and_stats():
    canvases, hw, _ = synthetic_canvas_batch(4, canvas=96, seed=1)
    rng = jax.random.key(0)
    out = ssl_augment_batch(rng, jnp.asarray(canvases), jnp.asarray(hw),
                            MEAN, STD, SSL_AUG)
    assert out.shape == (4, 224, 224, 3)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))
    # two different keys give different views of the same canvas
    out2 = ssl_augment_batch(jax.random.key(1), jnp.asarray(canvases),
                             jnp.asarray(hw), MEAN, STD, SSL_AUG)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_eval_resize_deterministic():
    canvases, hw, _ = synthetic_canvas_batch(3, canvas=96, seed=2)
    a = eval_resize_batch(jnp.asarray(canvases), jnp.asarray(hw), MEAN, STD)
    b = eval_resize_batch(jnp.asarray(canvases), jnp.asarray(hw), MEAN, STD)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (3, 224, 224, 3)


def test_rrc_distribution_mean_area():
    """Crop area/scale should follow U(scale_lo, scale_hi) roughly: mean
    crop area fraction ~ (lo+hi)/2 of the source area."""
    from sm3x.ops.augment import _sample_rrc_box

    lo, hi = FINETUNE_AUG.rrc_scale  # (0.3, 1.0)
    keys = jax.random.split(jax.random.key(0), 512)
    h = jnp.full((), 200.0)
    w = jnp.full((), 180.0)
    boxes = jax.vmap(lambda k: _sample_rrc_box(k, h, w, FINETUNE_AUG))(keys)
    areas = (boxes[2] * boxes[3]) / (200.0 * 180.0)
    # the 10-attempt rejection biases the mean slightly below (lo+hi)/2
    # (large crops with extreme aspect get rejected) — torchvision shares
    # this bias, so allow a modest margin.
    assert abs(float(areas.mean()) - (lo + hi) / 2) < 0.08
    # crops stay inside the image
    assert np.all(np.asarray(boxes[0]) >= 0)
    assert np.all(np.asarray(boxes[0] + boxes[2]) <= 200.0 + 1e-3)
    assert np.all(np.asarray(boxes[1] + boxes[3]) <= 180.0 + 1e-3)


def test_meta_codes_vocabularies(fake_root):
    meta = Derm7ptMeta(fake_root)
    assert meta.meta_codes.shape == (16, 3)
    assert set(meta.meta_fields) == {"elevation", "sex", "location"}
    for f in meta.meta_fields:
        assert len(meta.meta_vocabs[f]) >= 1
    assert meta.meta_codes.min() >= 0


def test_normalize_denormalize_roundtrip(rng_np):
    from sm3x.ops.augment import normalize_uint8, denormalize_to_uint8

    x = rng_np.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    mean = (0.5, 0.4, 0.3)
    std = (0.2, 0.25, 0.3)
    normed = normalize_uint8(jnp.asarray(x), mean, std)
    back = denormalize_to_uint8(normed, mean, std)
    np.testing.assert_allclose(np.asarray(back), x, atol=1)


def test_isic17_dataset_batches(tmp_path):
    """ISIC transfer wrapper (reference datasets.py:710-827): images +
    binary multi-label CSV -> padded batches with validity masks."""
    import csv

    from PIL import Image

    from sm3x.data.datasets import build_dataset

    img_dir = tmp_path / "ISIC-2017_Training_Data"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    n = 5
    with open(tmp_path / "train_labels.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image_id", "melanoma", "seborrheic_keratosis"])
        for i in range(n):
            img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
            Image.fromarray(img).save(img_dir / f"isic{i}.jpg")
            w.writerow([f"isic{i}", i % 2, (i + 1) % 2])

    data = build_dataset("ISIC17Dataset", str(tmp_path), "train",
                         cache_size=64)
    assert data.n == n
    batches = list(data.batches(4, epoch=0, seed=0))
    assert len(batches) == 2
    canv, hw, labels, idx, mask = batches[1]
    assert canv.shape == (4, 64, 64, 3) and canv.dtype == np.uint8
    assert labels.shape == (4, 2)
    # 5 % 4 == 1 real sample in the last batch, 3 padded
    assert mask.sum() == 1 and len(mask) == 4
    np.testing.assert_array_equal(hw[0], (40, 50))
    # every sample appears exactly once across real rows of all batches
    real = np.concatenate([b[3][b[4]] for b in batches])
    assert sorted(real.tolist()) == list(range(n))
