"""Persistent XLA compilation cache.

First compiles through the TPU tunnel are slow (minutes for the flagship graphs);
caching compiled executables on disk makes every subsequent process start fast.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    path = cache_dir or os.environ.get("VIT_TPU_JAX_CACHE", DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
