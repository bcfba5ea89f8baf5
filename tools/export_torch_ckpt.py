#!/usr/bin/env python
"""Export an sm3x checkpoint back to a reference-convention PyTorch
`.pth` (the inverse of the .pth->sm3x loaders), so sm3x-trained weights
can be handed to collaborators on the reference PyTorch stack:

  python tools/export_torch_ckpt.py --ckpt runs/exp/ckp_399.msgpack \
      --kind ssl --out sm3_ssl.pth [-a resnet50]
  python tools/export_torch_ckpt.py --ckpt runs/eval/best_eval.msgpack \
      --kind mlc --out best_finetune.pth

`--kind ssl` emits the stage-1 layout (derm_backbone.encoder.*, ...,
loadable by reference tools/mlc_train.py:341-346 / load_ssl_pretrain);
`--kind mlc` emits the released best_linear/best_finetune layout
(strict-loadable by reference inference.py:122-127).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser("sm3x -> torch checkpoint exporter")
    p.add_argument("--ckpt", type=str, required=True,
                   help="sm3x msgpack checkpoint (trainer ckp_*.msgpack / "
                        "best_eval.msgpack)")
    p.add_argument("--kind", choices=("ssl", "mlc"), required=True)
    p.add_argument("--out", type=str, required=True, help=".pth output path")
    p.add_argument("-a", "--arch", type=str, default="resnet50")
    p.add_argument("--mlc-proj", type=str, default="v4",
                   help="projector variant of the MLC head (v1-v4)")
    p.add_argument("--ddp-prefix", action="store_true",
                   help="prefix every key with `module.` (DDP-style)")
    args = p.parse_args()

    from sm3x.utils.checkpoint import load_checkpoint
    from sm3x.utils.torch_export import (export_mlc_model, export_simclr_skin,
                                         save_torch_checkpoint)

    tree = load_checkpoint(args.ckpt)
    params, stats = tree["params"], tree["batch_stats"]
    epoch = int(tree.get("epoch", 0))
    if args.kind == "ssl":
        sd = export_simclr_skin(params, stats, args.arch)
    else:
        sd = export_mlc_model(params, stats, args.arch, args.mlc_proj)
    save_torch_checkpoint(args.out, sd, epoch=epoch, ddp_prefix=args.ddp_prefix)
    print(f"wrote {len(sd)} tensors (epoch {epoch}) -> {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
