#!/usr/bin/env python
"""Stage-2 DeepCluster MLC training CLI (reference tools/mlc_train.py
surface). Loads the stage-1 checkpoint (msgpack or .pth) into the frozen
dual extractor and trains the per-label prototype heads on k-means
cluster assignments.

Thin shim over sm3x.cli.apps (also installed as the `sm3x-mlc-train`
console script)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sm3x.cli.apps import mlc_train_main as main

if __name__ == "__main__":
    main()
