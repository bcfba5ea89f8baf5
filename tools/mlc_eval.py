#!/usr/bin/env python
"""Supervised finetune/eval of the MLC model (reference tools/mlc_eval.py
surface) — produces best_eval + a results CSV in the released layout.

Thin shim over sm3x.cli.apps (also installed as the `sm3x-mlc-eval`
console script)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sm3x.cli.apps import mlc_eval_main as main

if __name__ == "__main__":
    main()
