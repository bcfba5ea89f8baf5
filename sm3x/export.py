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

from sm3x.serve import BucketedPredictor

_MANIFEST = "manifest.json"


def export_predictor(model, variables, path: str,
                     buckets: Sequence[int] = (1, 8, 32),
                     image_size: int = 224,
                     mean=(0.7833, 0.6712, 0.6026),
                     std=(0.2139, 0.2472, 0.2571),
                     canvas: int = 320,
                     crop_amount: int = 25,
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
    if not buckets:
        raise ValueError("export needs at least one batch bucket")
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
        "crop_amount": int(crop_amount),
        "mean": list(mean),
        "std": list(std),
        "num_classes": list(NUM_CLASSES),
        "platforms": list(exp.platforms),
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedPredictor(BucketedPredictor):
    """Serving wrapper over an exported artifact — the deserialized
    programs stand in for model+weights (no sm3x model code, no
    checkpoint, no tracing). Shares the bucketed request surface with
    sm3x.serve.Predictor, so it drops into the HTTP server unchanged."""

    def __init__(self, path: str):
        from jax import export as jexport

        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self.buckets = sorted(self.manifest["buckets"])
        self.canvas = int(self.manifest["canvas"])
        # pre-crop artifacts (no crop_amount key) predate the border-crop
        # preprocessing fix; apply the training pipeline's default
        self.crop_amount = int(self.manifest.get("crop_amount", 25))
        self.num_classes = tuple(self.manifest["num_classes"])
        self._fns = {}
        for b in self.buckets:
            with open(os.path.join(path, f"fwd_b{b}.stablehlo"), "rb") as f:
                self._fns[b] = jexport.deserialize(f.read())

    def _call(self, b, derm, derm_hw, clinic, clinic_hw):
        import jax.numpy as jnp

        return self._fns[b].call(
            jnp.asarray(derm), jnp.asarray(derm_hw),
            jnp.asarray(clinic), jnp.asarray(clinic_hw))


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
    p.add_argument("--crop-amount", type=int, default=25,
                   help="black-border crop the serving wrapper applies to "
                        "request images before letterbox (recorded in the "
                        "manifest; 0 disables)")
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
        canvas=args.canvas, crop_amount=args.crop_amount,
        platforms=args.platforms)
    size = sum(
        os.path.getsize(os.path.join(args.out, f))
        for f in os.listdir(args.out))
    print(f"exported buckets {manifest['buckets']} for platforms "
          f"{manifest['platforms']} -> {args.out} ({size / 1e6:.1f} MB)")


__all__ = ["export_predictor", "ExportedPredictor", "main"]
