"""Reconstruction-quality metrics: PSNR, and perceptual distance via the ConvNeXt-S
loss network (the LPIPS stand-in this stack uses — reference perceptual_loss.py).

These back the BASELINE.json north-star "recon PSNR/LPIPS parity" evaluation
(eval_recon.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio per batch element. a, b: (B, H, W, C) in [0,1]."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                   axis=(1, 2, 3))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def perceptual_distance(perceptual_loss, a: jax.Array, b: jax.Array) -> jax.Array:
    """Scalar perceptual distance using a PerceptualLoss instance (ConvNeXt-S logit
    MSE — the quantity the reference trains against)."""
    return perceptual_loss(a, b)


def global_norm(tree) -> jax.Array:
    """Global L2 norm of a pytree (what clip_by_global_norm computes)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def tree_norms(tree, prefix: str) -> dict:
    """Per-layer L2 norms, flattened to '<prefix>/<param/path>' scalars — the
    wandb.watch-equivalent observability surface (reference train_tatitok.py:155
    watches gradients; here both param and grad norms are loggable scalars)."""
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        out[f"{prefix}/{name}"] = jnp.linalg.norm(
            leaf.astype(jnp.float32).reshape(-1))
    return out
