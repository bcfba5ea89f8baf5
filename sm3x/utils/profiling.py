"""Tracing / profiling / numeric-debug hooks (SURVEY §5 aux subsystems).

The reference has only wall-clock AverageMeters (backbone_train.py:71-72)
and TORCH_DISTRIBUTED_DEBUG as its lone concurrency diagnostic (run.sh:3).
Here:

* `trace` — context manager around jax.profiler for XLA/TPU traces
  (view in TensorBoard / xprof);
* `annotate` — named TraceAnnotation for step phases;
* `StepTimer` — data/compute wall-clock split, the batch_time/data_time
  meter pair;
* `check_finite` — jax.debug NaN/Inf assertion on a pytree (the JAX
  analogue of torch's anomaly detection; jax.config.update
  ("jax_debug_nans", True) is the global switch).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str, with_memory: bool = True):
    """Capture an XLA profile for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the xprof timeline)."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks(enable: bool = True):
    """Global NaN detection inside jitted code (reruns the offending op
    un-jitted and raises with a stack trace)."""
    jax.config.update("jax_debug_nans", enable)


def check_finite(tree, name: str = "tree"):
    """In-graph finite check: jax.debug-prints any non-finite leaf count.
    Cheap enough to leave on in debugging runs."""

    def one(path, x):
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        bad = jnp.size(x) - jnp.sum(jnp.isfinite(x))
        jax.lax.cond(
            bad > 0,
            lambda: jax.debug.print(
                "NON-FINITE in {n} at {p}: {k} bad values", n=name,
                p=str(path), k=bad),
            lambda: None,
        )
        return x

    return jax.tree_util.tree_map_with_path(one, tree)


class StepTimer:
    """batch_time / data_time split meter (reference ssl_train meters)."""

    def __init__(self):
        self.data_time = 0.0
        self.step_time = 0.0
        self.count = 0
        self._mark = time.perf_counter()

    def data_ready(self):
        now = time.perf_counter()
        self.data_time += now - self._mark
        self._mark = now

    def step_done(self):
        now = time.perf_counter()
        self.step_time += now - self._mark
        self._mark = now
        self.count += 1

    def summary(self) -> dict:
        n = max(self.count, 1)
        return {"data_time": self.data_time / n, "step_time": self.step_time / n}
