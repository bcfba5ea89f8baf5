"""Batched inference serving.

The reference's public surface stops at a dummy forward (inference.py);
for production serving this module adds a `Predictor` that:

* jits ONE program per batch bucket (padding requests up to the bucket
  size — no recompiles for odd batch sizes),
* takes raw uint8 RGB images (any aspect) and applies the SAME
  preprocessing every training/eval image received — the 25-px black
  border crop (reference datasets.py:377-379) then letterbox — with
  resize+normalize on device,
* returns per-label softmax probabilities (B, C_i) per head.

`BucketedPredictor` is the shared request surface; `ExportedPredictor`
(sm3x.export) reuses it over deserialized StableHLO programs.
"""

from __future__ import annotations

import bisect
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sm3x import NUM_CLASSES
from sm3x.core.cache import enable_compilation_cache
from sm3x.ops.augment import eval_resize_batch
from sm3x.data.pipeline import letterbox


def crop_border(img: np.ndarray, crop_amount: int) -> np.ndarray:
    """The training pipeline's black-border crop (decode_canvas_batch):
    crop only when a non-empty interior remains."""
    if (crop_amount > 0 and img.shape[0] > 2 * crop_amount
            and img.shape[1] > 2 * crop_amount):
        return img[crop_amount:-crop_amount, crop_amount:-crop_amount]
    return img


class BucketedPredictor:
    """Shared serving request surface: border-crop + letterbox raw
    images into canvases, pick the smallest bucket that fits, pad up to
    it, chunk oversize requests through the largest bucket (BEFORE any
    canvas work), trim the padding off the outputs.

    Subclasses set `buckets`, `canvas`, `crop_amount`, `num_classes`
    and implement `_call(b, derm, derm_hw, clinic, clinic_hw)` returning
    the per-label probability arrays for bucket `b`."""

    buckets: Sequence[int]
    canvas: int
    crop_amount: int = 25
    num_classes: Sequence[int] = tuple(NUM_CLASSES)

    def _call(self, b: int, derm, derm_hw, clinic, clinic_hw):
        raise NotImplementedError

    def _bucket(self, n: int) -> int:
        i = bisect.bisect_left(self.buckets, n)
        return self.buckets[min(i, len(self.buckets) - 1)]

    def _canvases(self, images) -> tuple:
        """images: list of HxWx3 uint8 arrays (any sizes) -> canvases+hw,
        through the training pipeline's crop-then-letterbox."""
        n = len(images)
        canv = np.zeros((n, self.canvas, self.canvas, 3), np.uint8)
        hw = np.zeros((n, 2), np.int32)
        for i, img in enumerate(images):
            img = crop_border(np.asarray(img)[:, :, :3], self.crop_amount)
            canv[i], (h, w) = letterbox(img, self.canvas)
            hw[i] = (h, w)
        return canv, hw

    def predict(self, derm_images, clinic_images):
        """Lists of uint8 RGB arrays -> list of 8 (B, C_i) probability
        arrays (padding trimmed; oversize requests chunked through the
        largest bucket)."""
        assert len(derm_images) == len(clinic_images)
        n = len(derm_images)
        if n == 0:
            return [np.zeros((0, c), np.float32) for c in self.num_classes]
        b = self._bucket(n)
        if n > b:  # chunk BEFORE letterboxing anything
            outs = None
            for s in range(0, n, b):
                part = self.predict(derm_images[s:s + b],
                                    clinic_images[s:s + b])
                outs = part if outs is None else [
                    np.concatenate([a, c]) for a, c in zip(outs, part)]
            return outs
        dc, dhw = self._canvases(derm_images)
        cc, chw = self._canvases(clinic_images)

        def pad(x):
            reps = [(0, b - n)] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, reps, mode="edge") if n < b else x

        preds = self._call(b, pad(dc), pad(dhw), pad(cc), pad(chw))
        return [np.asarray(p)[:n] for p in preds]


class Predictor(BucketedPredictor):
    """Serving wrapper around an MLCModel + loaded variables."""

    def __init__(self, model, variables, mean, std, test_sz: int = 224,
                 buckets: Sequence[int] = (1, 8, 32, 128),
                 canvas: int = 320, crop_amount: int = 25):
        enable_compilation_cache()
        self.model = model
        self.variables = variables
        self.mean = tuple(mean)
        self.std = tuple(std)
        self.test_sz = test_sz
        self.buckets = sorted(buckets)
        self.canvas = canvas
        self.crop_amount = crop_amount

        @jax.jit
        def fwd(derm, derm_hw, clinic, clinic_hw):
            d = eval_resize_batch(derm, derm_hw, self.mean, self.std,
                                  (test_sz, test_sz))
            c = eval_resize_batch(clinic, clinic_hw, self.mean, self.std,
                                  (test_sz, test_sz))
            _, preds = self.model.apply(self.variables, d, c)
            # ONE packed (B, sum C_i) output: fetching 8 per-head arrays
            # costs 8 device->host round-trips per dispatch — the
            # dominant term of the serialized serving path on a
            # remote-attached chip (~23 ms RTT each, BENCH.md round 5)
            return jnp.concatenate(
                [jax.nn.softmax(p.astype(jnp.float32), axis=-1)
                 for p in preds], axis=-1)

        self._fwd = fwd

    @classmethod
    def from_checkpoint(cls, pretrain_path: str, arch: str = "resnet50",
                        mean=(0.7833, 0.6712, 0.6026),
                        std=(0.2139, 0.2472, 0.2571),
                        mlc_proj_dim: int = 512, sa_dim_ff: int = 128,
                        num_labels: int = 8, **kw):
        from sm3x.api import build_evaluator, load_weights

        model = build_evaluator(arch=arch, mlc_proj_dim=mlc_proj_dim,
                                num_labels=num_labels, sa_dim_ff=sa_dim_ff)
        variables = load_weights(pretrain_path, arch)
        return cls(model, variables, mean, std, **kw)

    def _call(self, b, derm, derm_hw, clinic, clinic_hw):
        packed = np.asarray(  # single fetch of the packed heads
            self._fwd(jnp.asarray(derm), jnp.asarray(derm_hw),
                      jnp.asarray(clinic), jnp.asarray(clinic_hw)))
        offs = np.cumsum(self.num_classes)[:-1]
        return np.split(packed, offs, axis=-1)


__all__ = ["Predictor", "BucketedPredictor", "crop_border"]
