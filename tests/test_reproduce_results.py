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


def test_compare_csv_aligns_by_column_name(tmp_path):
    """Cells match by column NAME: a reordered copy of the same data
    still passes, and a dropped column fails instead of zip-truncating
    silently."""
    import csv

    from reproduce_results import compare_csv

    a = os.path.join(tmp_path, "a.csv")
    _make_csv(a, np.random.default_rng(0))
    with open(a) as f:
        rows = list(csv.reader(f))

    # reorder: move the first value column to the end, in every row
    shuffled = os.path.join(tmp_path, "shuffled.csv")
    with open(shuffled, "w", newline="") as f:
        csv.writer(f).writerows(
            [[r[0]] + r[2:] + [r[1]] for r in rows])
    n_bad, report = compare_csv(shuffled, a, tolerance=0.0)
    assert n_bad == 0, report

    # truncate: drop the last column — must FAIL, not silently pass
    short = os.path.join(tmp_path, "short.csv")
    with open(short, "w", newline="") as f:
        csv.writer(f).writerows([r[:-1] for r in rows])
    n_bad, report = compare_csv(short, a, tolerance=0.0)
    assert n_bad > 0
    assert any("MISSING column" in r for r in report)


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


def test_preflight_names_missing_artifacts():
    """The quality-lock trigger (VERDICT r2 #9): with nothing staged, the
    one command that settles parity against the released weights must
    fail fast NAMING each missing artifact and how to stage it."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-m", "sm3x.reproduce",
         "--pretrain-path", "/nonexistent/best_finetune.pth",
         "--data-path", "/nonexistent/7PC",
         "--compare", "/nonexistent/finetune_results.csv"],
        capture_output=True, text=True,
        env=dict(os.environ, PALLAS_AXON_POOL_IPS=""),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode != 0
    err = proc.stderr
    assert "missing staged artifacts" in err
    assert "best_finetune.pth" in err and "meta.csv" in err
    assert "finetune_results.csv" in err
