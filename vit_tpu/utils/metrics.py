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


def _gaussian_window(size: int, sigma: float) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(a: jax.Array, b: jax.Array, max_val: float = 1.0,
         window_size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Structural similarity per batch element (Wang et al. 2004 defaults:
    11x11 Gaussian window, sigma 1.5, K1=0.01, K2=0.03), averaged over valid
    (un-padded) windows and channels. a, b: (B, H, W, C) in [0, max_val].

    The windowed means/variances are one depthwise convolution each
    (feature_group_count=C) — VPU work XLA fuses well; no pretrained weights
    needed, unlike LPIPS/rFID, so it runs in this egress-less environment.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c = a.shape[-1]
    kern = _gaussian_window(window_size, sigma)
    kern = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))  # HWIO, I/g=1

    def blur(x):
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)

    mu_a, mu_b = blur(a), blur(b)
    var_a = blur(a * a) - mu_a * mu_a
    var_b = blur(b * b) - mu_b * mu_b
    cov = blur(a * b) - mu_a * mu_b
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    num = (2.0 * mu_a * mu_b + c1) * (2.0 * cov + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))


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


def tree_histograms(tree, prefix: str, bins: int = 64) -> dict:
    """Per-layer value histograms, '<prefix>/<param/path>' → (counts, edges) —
    the full wandb.watch parity surface (reference train_tatitok.py:155 logs
    gradient/parameter HISTOGRAMS, not just norms). Computed ON DEVICE inside
    the jitted step (jnp.histogram is jit-safe: data-dependent bin edges,
    static shapes), so the host only ever fetches bins+1 floats per layer —
    cheap enough to ride the existing one-device_get metrics flush
    (train/loop.py). Rendered by MetricsLogger.log_histograms into the
    TensorBoard sink (add_histogram_raw) and wandb when present."""
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        out[f"{prefix}/{name}"] = jnp.histogram(
            leaf.astype(jnp.float32).reshape(-1), bins=bins)
    return out
