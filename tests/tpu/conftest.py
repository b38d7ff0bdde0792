"""TPU-only tests: undo the parent conftest's CPU forcing (safe because backends are
initialized lazily — nothing has touched a device yet at collection time)."""

import os

import jax

jax.config.update("jax_platforms", None)
# The parent conftest forces matmul precision "highest" for CPU golden tests;
# on TPU that makes Mosaic reject bf16 kernel matmuls ("Bad lhs type": bf16
# operands with forced-fp32 contract precision). Restore the default.
jax.config.update("jax_default_matmul_precision", None)

# Persistent compilation cache: a cold run of test_packed_attention_tpu.py
# spends >30 min in Mosaic/XLA compiles through the tunnel; warm-cache the
# whole suite targets < 5 min. Same cache dir as the train entry points.
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    from vit_tpu.utils.cache import DEFAULT_CACHE_DIR

    os.makedirs(DEFAULT_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", DEFAULT_CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
