#!/usr/bin/env python
"""Reproduce the released results CSVs from a checkpoint.

The reference's quality lock (SURVEY §4): evaluate best_linear.pth /
best_finetune.pth (torch .pth converted on the fly, or an sm3x msgpack)
over the Derm7pt test split, write the CSV in the released layout, and
optionally diff every cell against a reference CSV.

    python tools/reproduce_results.py --pretrain-path best_finetune.pth \
        --data-path ./data/7PC --out results.csv \
        --compare /path/to/finetune_results.csv --tolerance 0.2

Thin shim over sm3x.reproduce (also installed as the `sm3x-reproduce`
console script)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sm3x.reproduce import compare_csv, evaluate, main  # noqa: F401

if __name__ == "__main__":
    main()
