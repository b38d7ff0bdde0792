"""Bilinear+antialias image resize as two MXU matmuls.

The perceptual loss resizes every image to 224 (reference perceptual_loss.py:61-62).
A separable resampling is out = A · img · Bᵀ with static triangle-filter weight
matrices — two large matmuls instead of the gather graphs ``jax.image.resize`` can
emit, keeping the op on the MXU. Weights replicate the Pillow/torch antialias
construction (support scaled by the downscale ratio, normalized per output pixel), so
results match ``jax.image.resize(..., 'bilinear', antialias=True)``.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) triangle-filter resampling matrix (antialiased)."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale
    mat = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(np.floor(center - support)), 0)
        hi = min(int(np.ceil(center + support)), in_size)
        x = np.arange(lo, hi) + 0.5
        w = np.maximum(0.0, 1.0 - np.abs((x - center) / filterscale))
        total = w.sum()
        if total > 0:
            mat[i, lo:hi] = w / total
    return mat


def resize_bilinear_antialias(img: jnp.ndarray, out_h: int, out_w: int,
                              out_layout: str = "nhwc") -> jnp.ndarray:
    """img: (B, H, W, C) → (B, out_h, out_w, C); runs in the input dtype
    (fp32 in, fp32 out; a bf16 input keeps the whole resize in bf16).

    out_layout="hwnc" emits (out_h, out_w, B, C) instead — the batch-innermost
    layout the TPU ConvNeXt path wants (losses/perceptual.py) — for free: the
    final einsum writes its output in that order as part of the contraction."""
    b, h, w, c = img.shape
    dt = img.dtype if img.dtype in (jnp.float32, jnp.bfloat16) else jnp.float32
    a = jnp.asarray(_resize_matrix(h, out_h), dt)      # (out_h, H)
    bmat = jnp.asarray(_resize_matrix(w, out_w), dt)   # (out_w, W)
    x = img.astype(dt)
    x = jnp.einsum("oh,bhwc->bowc", a, x)              # rows
    spec = {"nhwc": "ow,bhwc->bhoc", "hwnc": "ow,bhwc->hobc"}[out_layout]
    x = jnp.einsum(spec, bmat, x)                      # cols (w axis)
    return x
