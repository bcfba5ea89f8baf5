"""Synthetic Derm7pt-layout data for tests and benchmarks (the reference
dataset is not redistributable; SURVEY §4 calls for fixture-driven tests)."""

from __future__ import annotations

import os
import numpy as np

from sm3x.data.derm7pt import GROUPED_SCHEMA, LABEL_ORD


def make_fake_derm7pt(root: str, n_cases: int = 24, img_size: int = 160,
                      seed: int = 0) -> str:
    """Write a miniature dataset tree in the reference's on-disk layout:
    meta.csv + {train,valid,test}_indexes.csv + images/."""
    import cv2
    import pandas as pd

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    rows = []
    for i in range(n_cases):
        row = {}
        for abbrev in LABEL_ORD:
            cat = GROUPED_SCHEMA[abbrev]
            lab = cat.labels[int(rng.integers(cat.n_classes))]
            names = lab.names if isinstance(lab.names, (tuple, list)) else (lab.names,)
            row[cat.colname] = names[int(rng.integers(len(names)))]
        for kind in ("derm", "clinic"):
            h = img_size + int(rng.integers(-16, 16))
            w = img_size + int(rng.integers(-16, 16))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            rel = f"case{i:04d}_{kind}.png"
            cv2.imwrite(os.path.join(img_dir, rel), img)
            row[kind] = rel
        row.update({"elevation": "flat", "sex": "male", "location": "back"})
        rows.append(row)

    pd.DataFrame(rows).to_csv(os.path.join(root, "meta.csv"), index=False)
    perm = rng.permutation(n_cases)
    n_tr = n_cases // 2
    n_va = n_cases // 4
    splits = {
        "train_indexes.csv": perm[:n_tr],
        "valid_indexes.csv": perm[n_tr:n_tr + n_va],
        "test_indexes.csv": perm[n_tr + n_va:],
    }
    for fname, idx in splits.items():
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
