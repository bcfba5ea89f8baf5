#!/usr/bin/env python
"""Shim to `sm3x.utils.torch_export:main` (installed as
`sm3x-export-torch`): export an sm3x checkpoint back to a
reference-convention PyTorch `.pth`:

  python tools/export_torch_ckpt.py --ckpt runs/exp/ckp_399.msgpack \
      --kind ssl --out sm3_ssl.pth [-a resnet50]
  python tools/export_torch_ckpt.py --ckpt runs/eval/best_eval.msgpack \
      --kind mlc --out best_finetune.pth
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sm3x.utils.torch_export import main

if __name__ == "__main__":
    main()
