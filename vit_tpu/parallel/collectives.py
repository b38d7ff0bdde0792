"""Audited cross-device collective helpers (SURVEY.md §2c).

The reference's only multi-device trace is a dead, undefined ``gather()`` in the
Bytedance quantizer (blocks.py:457). Under this framework's jit+GSPMD execution model,
most cross-device math needs NO explicit collective — arrays are logically global and
XLA inserts psums/all-gathers from the shardings. These wrappers exist for the
``shard_map`` / per-replica code paths (and as the single audited place collective
semantics live), covering exactly what the reference's workloads need: gradient sync,
codebook-usage union, global codebook statistics, metric averaging.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psum_grads(grads, axis_name: str = "data"):
    """Data-parallel gradient all-reduce (mean) — inside shard_map/pmap regions."""
    return jax.tree.map(lambda g: jax.lax.pmean(g, axis_name), grads)


def global_codebook_usage(local_usage: jax.Array, axis_name: str = "data"
                          ) -> jax.Array:
    """Union of per-replica codebook-usage bitmaps — the working version of what the
    reference's dead gather() wanted for usage stats (train_titok.py:164-167 under
    data parallelism)."""
    return jnp.minimum(jax.lax.psum(local_usage, axis_name), 1.0)


def all_gather_codes(indices: jax.Array, axis_name: str = "data") -> jax.Array:
    """Gather every replica's code indices — the collective blocks.py:457 needed for
    clustering-VQ reseeding when run per-replica."""
    return jax.lax.all_gather(indices, axis_name, tiled=True)


def mean_metric(value: jax.Array, axis_name: str = "data") -> jax.Array:
    """Cross-replica metric mean (eval metrics under DP)."""
    return jax.lax.pmean(value, axis_name)
