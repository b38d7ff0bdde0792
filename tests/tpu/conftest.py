"""TPU-only tests: undo the parent conftest's CPU forcing (safe because backends are
initialized lazily — nothing has touched a device yet at collection time)."""

import jax

jax.config.update("jax_platforms", None)
