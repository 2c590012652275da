"""Persistent XLA compilation cache.

Compile times through this environment's remote-compile service vary wildly
(30 s to ~10 min for the same graph); the on-disk executable cache makes every
CLI start after the first fast.  Call :func:`enable` before building any jitted
computation (the CLIs do it on startup).
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "SEDT_COMPILATION_CACHE", os.path.expanduser("~/.cache/sedt_tpu_xla")
)


def enable(cache_dir: str = None) -> str:
    import jax

    cache_dir = cache_dir or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
