"""Golden-CSV comparison harness."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from sm3x import NUM_CLASSES
from sm3x.metrics import write_results_csv


def _make_csv(path, rng):
    preds = [rng.normal(size=(40, c)).astype(np.float32) for c in NUM_CLASSES]
    targets = np.stack([rng.integers(0, c, 40) for c in NUM_CLASSES], axis=1)
    write_results_csv(path, preds, targets)
    return preds, targets


def test_compare_csv_self_passes(tmp_path):
    from reproduce_results import compare_csv

    rng = np.random.default_rng(0)
    a = os.path.join(tmp_path, "a.csv")
    _make_csv(a, rng)
    n_bad, report = compare_csv(a, a, tolerance=0.0)
    assert n_bad == 0, report


def test_compare_csv_flags_differences(tmp_path):
    from reproduce_results import compare_csv

    a = os.path.join(tmp_path, "a.csv")
    b = os.path.join(tmp_path, "b.csv")
    _make_csv(a, np.random.default_rng(0))
    _make_csv(b, np.random.default_rng(1))
    n_bad, report = compare_csv(a, b, tolerance=0.2)
    assert n_bad > 0
    assert any("vs ref" in r for r in report)


def test_compare_against_released_reference_layout(tmp_path):
    """Our emitter's header matches the released CSVs' header exactly."""
    ref = "/root/reference/linear_results.csv"
    if not os.path.exists(ref):
        import pytest

        pytest.skip("reference CSVs not mounted")
    ours = os.path.join(tmp_path, "ours.csv")
    _make_csv(ours, np.random.default_rng(2))
    with open(ours) as f:
        got = f.readline().strip()
    with open(ref) as f:
        want = f.readline().strip()
    assert got == want
