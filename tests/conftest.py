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


@pytest.fixture
def rng_np():
    return np.random.default_rng(3407)
