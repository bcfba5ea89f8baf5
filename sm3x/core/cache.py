"""Persistent XLA compilation cache.

First compiles of the big train steps take minutes on a tunneled TPU;
caching them on disk makes every subsequent process start in seconds.
Called by the trainers and bench at import-from-CLI time; safe to call
multiple times.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "SM3X_COMPILATION_CACHE", os.path.expanduser("~/.cache/sm3x_xla"))


def enable_compilation_cache(path: str = _DEFAULT_DIR):
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization only
