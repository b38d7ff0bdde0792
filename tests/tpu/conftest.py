"""TPU-only tests: undo the parent conftest's CPU forcing (safe because backends are
initialized lazily — nothing has touched a device yet at collection time)."""

import jax

jax.config.update("jax_platforms", None)
# The parent conftest forces matmul precision "highest" for CPU golden tests;
# on TPU that makes Mosaic reject bf16 kernel matmuls ("Bad lhs type": bf16
# operands with forced-fp32 contract precision). Restore the default.
jax.config.update("jax_default_matmul_precision", None)
