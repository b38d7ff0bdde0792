"""Persistent XLA compilation cache.

First compiles through the TPU tunnel are slow (minutes for the flagship graphs);
caching compiled executables on disk makes every subsequent process start fast.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def apply_platform_env() -> None:
    """Re-assert JAX_PLATFORMS from the environment.

    Needed because a sitecustomize TPU plugin (e.g. axon) may import jax and
    force its own platform at interpreter startup, which silently overrides a
    user's ``JAX_PLATFORMS=cpu python train_x.py``. Called from entry-point
    startup only — NEVER from library import — so test conftests that force a
    platform programmatically keep the last word."""
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        try:
            jax.config.update("jax_platforms", env)
        except Exception:
            pass  # backend already initialized; leave it be


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Entry-point bring-up: honor JAX_PLATFORMS, then enable the persistent
    compilation cache (first compiles through the TPU tunnel take minutes)."""
    apply_platform_env()
    path = cache_dir or os.environ.get("VIT_TPU_JAX_CACHE", DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
