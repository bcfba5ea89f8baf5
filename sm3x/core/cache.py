"""Persistent XLA compilation cache.

First compiles of the big train steps take minutes on a tunneled TPU;
caching them on disk makes every subsequent process start in seconds.
Called by the trainers and bench at import-from-CLI time; safe to call
multiple times.

CPU-backend entries are keyed by a host fingerprint so entries can never
be replayed on a host with a different ISA (XLA:CPU AOT results load
cross-machine with only a "could lead to SIGILL" warning). Note XLA
emits that warning even same-host for the big train-step entries —
+prefer-no-gather/scatter are compile-time tuning preferences recorded
as machine features, which the host feature probe never reports — so
the warning alone is not evidence of a real mismatch. TPU entries stay
in the shared dir (produced by the same remote compiler regardless of
host).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "SM3X_COMPILATION_CACHE", os.path.expanduser("~/.cache/sm3x_xla"))


def machine_tag() -> str:
    """Stable fingerprint of this host's CPU (ISA feature flags)."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1(
        (platform.machine() + feats).encode()).hexdigest()[:10]


def enable_compilation_cache(path: str | None = None):
    import jax

    try:
        if jax.config.jax_compilation_cache_dir:
            return  # already configured (e.g. the test conftest's dir)
        if path is None:
            path = _DEFAULT_DIR
            # default_backend() initializes the backend; every caller
            # runs after the platform choice is final
            if jax.default_backend() == "cpu":
                path = f"{path}_cpu_{machine_tag()}"
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization only
