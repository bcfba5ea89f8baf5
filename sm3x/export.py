"""AOT model export: serialize the jitted inference program to a
self-contained StableHLO artifact (jax.export).

The reference's deployment unit is a `.pth` plus the Python model code
that rebuilds it (reference inference.py:98-136). TPU-natively the
deployment unit can be the *compiled program itself*: `jax.export`
captures the traced computation — weights baked in as constants — as
serialized StableHLO that `load_exported` runs without the sm3x model
code, the checkpoint, or any tracing at load time. One program is
exported per batch bucket (the same padding discipline as
sm3x.serve.Predictor), so serving never recompiles for odd batch sizes.

Artifact layout (a directory):
    manifest.json             {"buckets": [...], "image_size": ...,
                               "platforms": [...], "num_classes": [...]}
    fwd_b{N}.stablehlo        serialized Exported per bucket
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

_MANIFEST = "manifest.json"


def export_predictor(model, variables, path: str,
                     buckets: Sequence[int] = (1, 8, 32),
                     image_size: int = 224,
                     mean=(0.7833, 0.6712, 0.6026),
                     std=(0.2139, 0.2472, 0.2571),
                     canvas: int = 320,
                     platforms: Sequence[str] | None = None) -> dict:
    """Export the full eval path (device resize+normalize -> MLC model ->
    per-label softmax) at each batch bucket. Inputs per bucket b:
    uint8 canvases (b, canvas, canvas, 3) + valid-hw (b, 2) per modality;
    outputs 8 probability arrays (b, C_i).

    `platforms` defaults to the current backend; pass e.g.
    ("cpu", "tpu") for an artifact loadable on both."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from sm3x import NUM_CLASSES
    from sm3x.ops.augment import eval_resize_batch

    os.makedirs(path, exist_ok=True)
    mean, std = tuple(mean), tuple(std)

    def fwd(derm, derm_hw, clinic, clinic_hw):
        d = eval_resize_batch(derm, derm_hw, mean, std,
                              (image_size, image_size))
        c = eval_resize_batch(clinic, clinic_hw, mean, std,
                              (image_size, image_size))
        _, preds = model.apply(variables, d, c)
        return [jax.nn.softmax(p.astype(jnp.float32), axis=-1)
                for p in preds]

    buckets = sorted(set(int(b) for b in buckets))
    for b in buckets:
        args = (
            jax.ShapeDtypeStruct((b, canvas, canvas, 3), jnp.uint8),
            jax.ShapeDtypeStruct((b, 2), jnp.int32),
            jax.ShapeDtypeStruct((b, canvas, canvas, 3), jnp.uint8),
            jax.ShapeDtypeStruct((b, 2), jnp.int32),
        )
        exp = jexport.export(jax.jit(fwd), platforms=platforms)(*args)
        with open(os.path.join(path, f"fwd_b{b}.stablehlo"), "wb") as f:
            f.write(exp.serialize())
    manifest = {
        "buckets": buckets,
        "image_size": int(image_size),
        "canvas": int(canvas),
        "mean": list(mean),
        "std": list(std),
        "num_classes": list(NUM_CLASSES),
        "platforms": list(exp.platforms),
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedPredictor:
    """Serving wrapper over an exported artifact — the deserialized
    programs stand in for model+weights (no sm3x model code, no
    checkpoint, no tracing). Same uint8-canvas request surface as
    sm3x.serve.Predictor, so it drops into the HTTP server unchanged."""

    def __init__(self, path: str):
        from jax import export as jexport

        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self.buckets = list(self.manifest["buckets"])
        self.canvas = int(self.manifest["canvas"])
        self._fns = {}
        for b in self.buckets:
            with open(os.path.join(path, f"fwd_b{b}.stablehlo"), "rb") as f:
                self._fns[b] = jexport.deserialize(f.read())

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _canvases(self, images):
        from sm3x.data.pipeline import letterbox

        n = len(images)
        canv = np.zeros((n, self.canvas, self.canvas, 3), np.uint8)
        hw = np.zeros((n, 2), np.int32)
        for i, img in enumerate(images):
            canv[i], (h, w) = letterbox(np.asarray(img)[:, :, :3], self.canvas)
            hw[i] = (h, w)
        return canv, hw

    def predict(self, derm_images, clinic_images):
        """Lists of uint8 RGB arrays -> list of 8 (B, C_i) probability
        arrays (padding trimmed; oversize requests chunked through the
        largest bucket)."""
        import jax.numpy as jnp

        assert len(derm_images) == len(clinic_images)
        n = len(derm_images)
        if n == 0:
            return [np.zeros((0, c), np.float32)
                    for c in self.manifest["num_classes"]]
        b = self._bucket(n)
        if n > b:
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

        preds = self._fns[b].call(jnp.asarray(pad(dc)), jnp.asarray(pad(dhw)),
                                  jnp.asarray(pad(cc)), jnp.asarray(pad(chw)))
        return [np.asarray(p)[:n] for p in preds]


def main():
    """CLI: checkpoint -> AOT serving artifact (sm3x-export-aot;
    tools/export_model.py is the repo-checkout shim)."""
    import argparse

    p = argparse.ArgumentParser("sm3x AOT exporter")
    p.add_argument("--pretrain-path", type=str, required=True,
                   help="best_linear/best_finetune .pth or sm3x msgpack")
    p.add_argument("--out", type=str, required=True,
                   help="artifact output directory")
    p.add_argument("-a", "--arch", type=str, default="resnet50")
    p.add_argument("--test-sz", type=int, default=224)
    p.add_argument("--canvas", type=int, default=320)
    p.add_argument("--buckets", nargs="*", type=int, default=[1, 8, 32])
    p.add_argument("--mean", nargs=3, type=float,
                   default=[0.7833, 0.6712, 0.6026])
    p.add_argument("--std", nargs=3, type=float,
                   default=[0.2139, 0.2472, 0.2571])
    p.add_argument("--platforms", nargs="*", type=str, default=None,
                   help="lowering platforms, e.g. 'cpu tpu' for an "
                        "artifact loadable on both (default: current)")
    args = p.parse_args()

    from sm3x.api import build_evaluator, load_weights
    from sm3x.core.cache import enable_compilation_cache

    enable_compilation_cache()
    model = build_evaluator(arch=args.arch)
    variables = load_weights(args.pretrain_path, args.arch)
    manifest = export_predictor(
        model, variables, args.out, buckets=args.buckets,
        image_size=args.test_sz, mean=args.mean, std=args.std,
        canvas=args.canvas, platforms=args.platforms)
    size = sum(
        os.path.getsize(os.path.join(args.out, f))
        for f in os.listdir(args.out))
    print(f"exported buckets {manifest['buckets']} for platforms "
          f"{manifest['platforms']} -> {args.out} ({size / 1e6:.1f} MB)")


__all__ = ["export_predictor", "ExportedPredictor", "main"]
