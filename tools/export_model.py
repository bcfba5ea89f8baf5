#!/usr/bin/env python
"""Shim to `sm3x.export:main` (installed as `sm3x-export-aot`): export a
released/trained MLC checkpoint to a self-contained AOT serving artifact
(serialized StableHLO per batch bucket, weights baked in). Serve it with
    sm3x-serve --exported-path <out-dir>

Usage:
  python tools/export_model.py --pretrain-path best_finetune.pth \
      --out artifact/ [--arch resnet50] [--buckets 1 8 32] \
      [--platforms cpu tpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sm3x.export import main

if __name__ == "__main__":
    main()
