"""Synthetic Derm7pt-layout data for tests and benchmarks (the reference
dataset is not redistributable; SURVEY §4 calls for fixture-driven tests)."""

from __future__ import annotations

import os
import numpy as np

from sm3x.data.derm7pt import GROUPED_SCHEMA, LABEL_ORD


def render_label_texture(rng: np.random.Generator, label, modality_shift: float,
                         size: int) -> np.ndarray:
    """A (size, size, 3) uint8 image whose LUMINANCE TEXTURE encodes the
    8-category label vector (grating orientation/frequencies + a BWV
    checkerboard), the same family tools/demo_synthetic_e2e.py trains on.
    Texture (not hue/brightness) survives the SSL augmentations —
    ColorJitter/grayscale would actively unlearn color-coded labels. The
    per-image identity is a continuous jitter AROUND the label-determined
    parameters, so instance discrimination must encode them and a linear
    probe recovers the labels by thresholding — like real lesions, where
    the instance's appearance IS the label evidence."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    phase = rng.uniform(0, 2 * np.pi, 4)
    theta = np.pi * (label[0] + rng.uniform(0.1, 0.9)) / 5.0 + modality_shift
    f1 = 6 + 3 * (label[1] + rng.uniform(0.1, 0.9))
    f2 = 4 + 4 * (label[3] + rng.uniform(0.1, 0.9))
    f3 = 5 + 5 * (label[4] + rng.uniform(0.1, 0.9))
    u = xx * np.cos(theta) + yy * np.sin(theta)
    tex = 0.5 * np.sin(2 * np.pi * f1 * u + phase[0])
    tex += 0.4 * np.sin(2 * np.pi * f2 * yy + phase[1])
    tex += 0.3 * np.sin(2 * np.pi * f3 * xx + phase[2])
    if label[2]:  # BWV: checkerboard component
        tex += rng.uniform(0.3, 0.5) * np.sign(
            np.sin(2 * np.pi * 8 * xx + phase[3])
            * np.sin(2 * np.pi * 8 * yy))
    base = 128 + 55 * tex / 1.6
    img = np.stack([base, base, base], axis=-1)
    noise = rng.normal(0, 10, img.shape)
    return np.clip(img + noise, 0, 255).astype(np.uint8)


def make_fake_derm7pt(root: str, n_cases: int = 24, img_size: int = 160,
                      seed: int = 0, splits=None, structured: bool = False,
                      ext: str = "png") -> str:
    """Write a synthetic dataset tree in the reference's on-disk layout:
    meta.csv + {train,valid,test}_indexes.csv + images/.

    splits: optional (n_train, n_valid, n_test), summing to n_cases —
      e.g. the reference Derm7pt sizes (413, 203, 395) for recipe-scale
      runs; default keeps the historical n/2, n/4, rest fixture split.
    structured: label-correlated luminance textures (render_label_texture)
      instead of uniform noise, so SSL learnability is measurable.
    ext: image container; "jpg" routes decode through the native libjpeg
      loader (sm3x/native/loader.cpp), as the real JPEG dataset would."""
    import cv2
    import pandas as pd

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    rows = []
    for i in range(n_cases):
        row = {}
        nums = []
        for abbrev in LABEL_ORD:
            cat = GROUPED_SCHEMA[abbrev]
            lab = cat.labels[int(rng.integers(cat.n_classes))]
            nums.append(lab.num)
            names = lab.names if isinstance(lab.names, (tuple, list)) else (lab.names,)
            row[cat.colname] = names[int(rng.integers(len(names)))]
        for kind, shift in (("derm", 0.0), ("clinic", 0.07)):
            h = img_size + int(rng.integers(-16, 16))
            w = img_size + int(rng.integers(-16, 16))
            if structured:
                img = render_label_texture(rng, nums, shift, max(h, w))[:h, :w]
            else:
                img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            rel = f"case{i:04d}_{kind}.{ext}"
            cv2.imwrite(os.path.join(img_dir, rel), img)
            row[kind] = rel
        row.update({"elevation": "flat", "sex": "male", "location": "back"})
        rows.append(row)

    pd.DataFrame(rows).to_csv(os.path.join(root, "meta.csv"), index=False)
    perm = rng.permutation(n_cases)
    if splits is None:
        n_tr, n_va = n_cases // 2, n_cases // 4
    else:
        n_tr, n_va, n_te = splits
        if n_tr + n_va + n_te != n_cases:
            raise ValueError(f"splits {splits} must sum to n_cases={n_cases}")
    split_files = {
        "train_indexes.csv": perm[:n_tr],
        "valid_indexes.csv": perm[n_tr:n_tr + n_va],
        "test_indexes.csv": perm[n_tr + n_va:],
    }
    for fname, idx in split_files.items():
        pd.DataFrame({"indexes": idx}).to_csv(os.path.join(root, fname), index=False)
    return root


def synthetic_canvas_batch(batch_size: int, canvas: int = 320, seed: int = 0):
    """Random uint8 canvases + valid sizes, for bench without any dataset."""
    rng = np.random.default_rng(seed)
    canvases = rng.integers(0, 256, (batch_size, canvas, canvas, 3), dtype=np.uint8)
    hw = np.stack([
        rng.integers(canvas // 2, canvas + 1, batch_size),
        rng.integers(canvas // 2, canvas + 1, batch_size),
    ], axis=1).astype(np.int32)
    labels = rng.integers(0, 2, (batch_size, 8)).astype(np.int32)
    return canvases, hw, labels
