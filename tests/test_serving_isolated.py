"""Run the serving test files (tests/isolated/) in their OWN pytest
processes.

Why: after the serving Predictor's jitted programs run, the shared
XLA:CPU client can stall a LATER 8-device collective rendezvous
indefinitely — XLA's watchdog then aborts the whole pytest process
("rendezvous.cc: Expected 8 threads to join the rendezvous, but not all
of them arrived on time", then SIGABRT). Measured: the multicrop SSL
step passes in 80s in isolation but hangs 20+ minutes after ONE serve
test in the same process. Isolation keeps `pytest tests/` covering the
serving stack without exposing the rest of the suite to the stall."""

import os
import subprocess
import sys

import pytest

TESTS = os.path.dirname(os.path.abspath(__file__))


def _run_isolated(fname: str):
    env = dict(os.environ)
    # no axon tunnel session in the child (sitecustomize only registers
    # the plugin when this var is non-empty); the isolated conftest
    # forces the CPU mesh in-process either way.
    env["PALLAS_AXON_POOL_IPS"] = ""
    res = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.join(TESTS, "isolated", fname), "-q"],
        capture_output=True, text=True, timeout=1500, env=env,
        cwd=os.path.dirname(TESTS))
    assert res.returncode == 0, (
        f"isolated {fname} failed (rc={res.returncode})\n"
        f"--- stdout ---\n{res.stdout[-4000:]}\n"
        f"--- stderr ---\n{res.stderr[-2000:]}")
    assert " passed" in res.stdout


def test_serve_suite_isolated():
    _run_isolated("test_serve.py")


def test_export_suite_isolated():
    _run_isolated("test_export.py")


def test_multicrop_suite_isolated():
    # not a serving test — isolated because it is the heaviest in-process
    # program and pays a 10x rendezvous stall in a shared client
    _run_isolated("test_multicrop.py")
