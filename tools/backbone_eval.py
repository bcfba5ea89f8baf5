#!/usr/bin/env python
"""Backbone linear eval CLI (reference tools/backbone_eval.py surface):
load the SSL checkpoint's encoders into a dual-backbone Baseline and
train the 8 linear heads (--finetune fc freezes the backbones).

Thin shim over sm3x.cli.apps (also installed as the `sm3x-backbone-eval`
console script)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sm3x.cli.apps import backbone_eval_main as main

if __name__ == "__main__":
    main()
