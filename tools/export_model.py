#!/usr/bin/env python
"""Export a released/trained MLC checkpoint to a self-contained AOT
serving artifact (sm3x.export): serialized StableHLO per batch bucket,
weights baked in. Serve it with
    sm3x-serve --exported-path <out-dir>
(no model code or checkpoint needed at serve time).

Usage:
  python tools/export_model.py --pretrain-path best_finetune.pth \
      --out artifact/ [--arch resnet50] [--buckets 1 8 32] \
      [--platforms cpu tpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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
    from sm3x.export import export_predictor

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


if __name__ == "__main__":
    main()
