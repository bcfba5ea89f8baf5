"""TPU-first input pipeline.

Reference pipeline (N3 in SURVEY §2b): OpenCV JPEG decode + torchvision
CPU transforms inside DataLoader worker processes for EVERY epoch. Here
the host work happens once: each image is decoded (OpenCV, BGR->RGB —
functional.py:30-36), border-cropped (25 px, datasets.py:499) and
letterboxed into a fixed uint8 canvas that is cached in RAM (Derm7pt is
~2k images — a few hundred MB). Every epoch then only slices uint8
canvases into pinned batches; all random augmentation runs fused on the
TPU (sm3x.ops.augment). The canvas keeps the image's aspect ratio and
records the valid (h, w) so RandomResizedCrop samples the same geometry
distribution as the reference's full-resolution crops.
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
from typing import Sequence, Tuple

import numpy as np


def decode_image(path: str) -> np.ndarray:
    """OpenCV decode to RGB uint8 (functional.py:30-36)."""
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def letterbox(img: np.ndarray, size: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Fit `img` into a (size, size) canvas top-left, preserving aspect.
    Returns (canvas uint8, valid (h, w))."""
    import cv2

    h, w = img.shape[:2]
    scale = min(size / h, size / w)
    if scale < 1.0:
        nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
    else:
        nh, nw = h, w
    canvas = np.zeros((size, size, 3), dtype=np.uint8)
    canvas[:nh, :nw] = img
    return canvas, (nh, nw)


def decode_canvas_batch(paths: Sequence[str], cache_size: int,
                        crop_amount: int = 25, workers: int = 8,
                        use_native: bool = True
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode `paths` into ((N,S,S,3) uint8 canvases, (N,2) int32 valid
    hw). JPEGs go through the native multi-threaded libjpeg loader
    (sm3x/native/loader.cpp); anything it can't handle (PNG, missing
    toolchain) falls back to the OpenCV path per file."""
    n = len(paths)
    canvases = np.zeros((n, cache_size, cache_size, 3), dtype=np.uint8)
    valid_hw = np.zeros((n, 2), dtype=np.int32)

    todo = list(range(n))
    if use_native and n:
        try:
            from sm3x.native.loader import decode_letterbox_batch

            canv, hw, ok = decode_letterbox_batch(
                list(paths), cache_size, crop_amount, workers)
            done = np.nonzero(ok)[0]
            canvases[done] = canv[done]
            valid_hw[done] = hw[done]
            todo = [i for i in range(n) if not ok[i]]
        except Exception:
            todo = list(range(n))

    def load(i):
        img = decode_image(paths[i])[:, :, :3]
        # guard tiny images (same rule as the native loader): only
        # crop when a non-empty interior remains
        if (crop_amount > 0 and img.shape[0] > 2 * crop_amount
                and img.shape[1] > 2 * crop_amount):
            img = img[crop_amount:-crop_amount, crop_amount:-crop_amount]
        canvas, (h, w) = letterbox(img, cache_size)
        canvases[i] = canvas
        valid_hw[i] = (h, w)

    if todo:
        with cf.ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(load, todo))
    return canvases, valid_hw


class ImageStore:
    """Decode-once uint8 canvas cache for a list of image paths."""

    def __init__(self, paths: Sequence[str], cache_size: int = 320,
                 crop_amount: int = 25, workers: int = 8,
                 use_native: bool = True):
        self.cache_size = cache_size
        self.crop_amount = crop_amount
        self.canvases, self.valid_hw = decode_canvas_batch(
            paths, cache_size, crop_amount, workers, use_native)


@dataclasses.dataclass
class Batch:
    derm: np.ndarray          # (B, S, S, 3) uint8 canvases
    derm_hw: np.ndarray       # (B, 2) int32
    clinic: np.ndarray
    clinic_hw: np.ndarray
    label: np.ndarray         # (B, 8) int32
    index: np.ndarray         # (B,) int32 dataset indices
    mask: np.ndarray          # (B,) bool — False on wrap-padding (eval)
    meta: np.ndarray = None   # (B, F) int32 metadata codes (tri-modal)


def iter_batch_selections(order: np.ndarray, batch_size: int):
    """Yield (sel, mask) index slices of `order` padded (by wrapping) to
    a fixed batch size — THE one definition of which samples each step
    sees, shared by every feed (cached/resident/streaming) so switching
    feeds never changes sample selection. Mask is False on wrap-padding
    (the reference's DistributedSampler pads similarly; SURVEY §7
    'tiny-dataset distributed sampling')."""
    n = len(order)
    for start in range(0, n, batch_size):
        sel = order[start:start + batch_size]
        mask = np.ones(len(sel), dtype=bool)
        if len(sel) < batch_size:
            padn = batch_size - len(sel)
            # np.resize tiles when padn > n (tiny splits vs big batches)
            sel = np.concatenate([sel, np.resize(order, padn)])
            mask = np.concatenate([mask, np.zeros(padn, dtype=bool)])
        yield sel, mask


class PairedImageData:
    """A split of paired derm/clinic canvases + labels, ready to batch."""

    def __init__(self, derm_paths, clinic_paths, labels,
                 cache_size: int = 320, crop_amount: int = 25, workers: int = 8,
                 meta_codes=None, meta_vocab_sizes=None):
        self.derm = ImageStore(derm_paths, cache_size, crop_amount, workers)
        self.clinic = ImageStore(clinic_paths, cache_size, crop_amount, workers)
        self.labels = np.asarray(labels, dtype=np.int32)
        self.n = len(derm_paths)
        # categorical patient metadata codes — the third modality of the
        # tri-modal model (sm3x/models/trimodal.py)
        self.meta_codes = (None if meta_codes is None
                           else np.asarray(meta_codes, dtype=np.int32))
        self.meta_vocab_sizes = meta_vocab_sizes

    @classmethod
    def from_meta(cls, meta, split: str, cache_size: int = 320, workers: int = 8):
        d, c, y = meta.examples(split)
        idx = meta.split_indexes(split)
        return cls(d, c, y, cache_size, meta.crop_amount, workers,
                   meta_codes=meta.meta_codes[idx],
                   meta_vocab_sizes=[len(meta.meta_vocabs[f])
                                     for f in meta.meta_fields])

    def epoch_order(self, epoch: int, seed: int = 3407, shuffle: bool = True):
        """Deterministic per-epoch permutation (the reference's
        DistributedSampler.set_epoch analogue, misc.py:437 + loop :560)."""
        idx = np.arange(self.n)
        if shuffle:
            rng = np.random.default_rng(seed + epoch)
            rng.shuffle(idx)
        return idx

    def batches(self, batch_size: int, epoch: int = 0, seed: int = 3407,
                shuffle: bool = True, pad: str = "wrap"):
        """Yield fixed-size Batches (static shapes for jit); see
        iter_batch_selections for the padding semantics."""
        order = self.epoch_order(epoch, seed, shuffle)
        for sel, mask in iter_batch_selections(order, batch_size):
            yield Batch(
                derm=self.derm.canvases[sel],
                derm_hw=self.derm.valid_hw[sel],
                clinic=self.clinic.canvases[sel],
                clinic_hw=self.clinic.valid_hw[sel],
                label=self.labels[sel],
                index=sel.astype(np.int32),
                mask=mask,
                meta=(None if self.meta_codes is None
                      else self.meta_codes[sel]),
            )

    def steps_per_epoch(self, batch_size: int) -> int:
        return (self.n + batch_size - 1) // batch_size
