#!/usr/bin/env python
"""Stage-1 SSL pretraining CLI (reference tools/backbone_train.py surface).

    python tools/backbone_train.py -a resnet50 --arch-version v32 \
        --data-name SevenPCBaseDataset --data-path ./data/7PC \
        --mean 0.7833 0.6712 0.6026 --std 0.2139 0.2472 0.2571 \
        --epochs 400 -b 96 -lr 1e-6 --proj-dim 128 --temperature 0.1 --amp

Thin shim over sm3x.cli.apps (also installed as the `sm3x-backbone-train`
console script)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sm3x.cli.apps import backbone_train_main as main

if __name__ == "__main__":
    main()
