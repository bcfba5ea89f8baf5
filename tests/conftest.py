"""Test harness: force an 8-virtual-device CPU backend (see
tests/_backend.py). The `isolated/` subtree is EXCLUDED from in-process
collection: its serving tests leave the XLA:CPU client in a state that
stalls later 8-device collective rendezvous indefinitely (the watchdog
then SIGABRTs the whole process — rendezvous.cc "Expected 8 threads to
join"); tests/test_serving_isolated.py runs them in their own pytest
subprocesses instead."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _backend import force_cpu_mesh  # noqa: E402

force_cpu_mesh(8)

collect_ignore = ["isolated"]

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Run the big in-process 8-device trainer files FIRST: late in a long
# run, the XLA:CPU client's accumulated state slows multi-device
# collective rendezvous by minutes (measured: multicrop SSL step 80s in
# isolation vs 1130s at position ~115 of the suite; the deterministic
# step 60s vs 280s). Subprocess-driven tests are immune and go last.
_RUN_FIRST = [
    "test_ssl_train.py", "test_joint_aug.py", "test_stage2_train.py",
    "test_tp_vit.py", "test_tp.py", "test_vit_trimodal.py",
    "test_checkpoint.py", "test_augment_pallas.py",
]
_RUN_LAST = [
    "test_cli_smoke.py", "test_serving_isolated.py", "test_torch_export.py",
    "test_arch_weights.py", "test_reproduce_results.py", "test_multihost.py",
]


def pytest_collection_modifyitems(items):
    def rank(item):
        name = os.path.basename(str(item.fspath))
        if name in _RUN_FIRST:
            return (0, _RUN_FIRST.index(name))
        if name in _RUN_LAST:
            return (2, _RUN_LAST.index(name))
        return (1, 0)

    items.sort(key=rank)  # stable: preserves within-file order


@pytest.fixture
def rng_np():
    return np.random.default_rng(3407)
