"""Conftest for the process-isolated serving tests (run via
tests/test_serving_isolated.py, or directly:
`pytest tests/isolated -q`). Same forced CPU mesh as the main suite —
these live in their own pytest process because their Predictor programs
poison later 8-device collective rendezvous in the shared XLA:CPU
client (see tests/conftest.py)."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _backend import force_cpu_mesh  # noqa: E402

force_cpu_mesh(8)
