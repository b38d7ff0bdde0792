"""Vector quantizers: the author's minimal L2-norm VQ and an FSQ variant.

``Quantizer`` reproduces the reference's 15-line VQ (train_titok.py:45-59, copied
verbatim at train_vit_vqgan.py:45-59, train_enhancing_vitvqgan.py:238-252,
train_llamagen_titok.py:51-67 — here it exists ONCE):
  - L2-normalize input and codebook, nearest neighbor by distance (fused Pallas
    lookup: argmax of the dot product, vit_tpu/kernels/vq.py);
  - quantized vectors looked up from the UN-normalized codebook (a reference
    subtlety: train_titok.py:54 uses self.codebook(indices), not the normalized
    embedding);
  - codebook loss + β=0.25 commitment loss, straight-through estimator.

All quantization math runs in fp32 ("fp32 island") regardless of the surrounding
compute dtype, mirroring the reference's @autocast(enabled=False) (blocks.py:428).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_tpu.kernels.vq import nearest_code


def codebook_init(codebook_size: int):
    """U(−1/C, 1/C) — the reference codebook init (train_titok.py:49)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / codebook_size
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Quantizer(nn.Module):
    """Author's minimal L2-norm VQ (reference train_titok.py:45-59)."""

    codebook_size: int
    latent_dim: int
    beta: float = 0.25
    vq_impl: Optional[str] = None  # None=auto, "pallas", "xla"

    @nn.compact
    def __call__(self, z: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """z: (..., latent_dim) -> (quantized_ste fp32, indices int32, loss fp32)."""
        codebook = self.param("codebook", codebook_init(self.codebook_size),
                              (self.codebook_size, self.latent_dim), jnp.float32)
        z32 = z.astype(jnp.float32)
        zn = z32 / jnp.maximum(jnp.linalg.norm(z32, axis=-1, keepdims=True), 1e-12)
        indices = nearest_code(zn, codebook, l2_normalize=True, impl=self.vq_impl)
        quantized = jnp.take(codebook, indices, axis=0)  # un-normalized lookup
        codebook_loss = jnp.mean((quantized - jax.lax.stop_gradient(zn)) ** 2)
        commitment_loss = self.beta * jnp.mean(
            (jax.lax.stop_gradient(quantized) - zn) ** 2)
        quantize_loss = codebook_loss + commitment_loss
        quantized = zn + jax.lax.stop_gradient(quantized - zn)  # STE
        return quantized, indices, quantize_loss

    def lookup(self, indices: jax.Array) -> jax.Array:
        """Index → codebook vector (reference's decode_indices path,
        train_titok.py:88). Usable via module.apply(..., method='lookup')."""
        codebook = self.get_variable("params", "codebook")
        return jnp.take(codebook, indices, axis=0)


class FSQ(nn.Module):
    """Finite Scalar Quantization — the variant the reference imported but never wired
    up (train_titok.py:10, SURVEY.md §2d quirk 8), provided as a config option.

    Each latent channel is bounded with tanh and rounded to ``levels[i]`` values;
    straight-through gradients. Codebook size = prod(levels); no codebook params and
    no auxiliary losses (quantize_loss ≡ 0).
    """

    levels: Sequence[int]

    @property
    def codebook_size(self) -> int:
        out = 1
        for l in self.levels:
            out *= l
        return out

    @nn.compact
    def __call__(self, z: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        if z.shape[-1] != len(self.levels):
            raise ValueError(
                f"FSQ expects latent_dim == len(levels) ({len(self.levels)}), "
                f"got {z.shape[-1]}")
        levels = jnp.asarray(self.levels, jnp.float32)
        half = (levels - 1.0) / 2.0
        z32 = z.astype(jnp.float32)
        bounded = jnp.tanh(z32) * half           # (-half, half) per channel
        rounded = jnp.round(bounded)
        quantized = bounded + jax.lax.stop_gradient(rounded - bounded)
        quantized = quantized / jnp.maximum(half, 1e-12)  # normalize to (-1, 1)
        # pack per-channel digits into a single code index
        digits = (rounded + half).astype(jnp.int32)
        radix = jnp.cumprod(jnp.asarray([1] + list(self.levels[:-1]), jnp.int32))
        indices = jnp.sum(digits * radix, axis=-1)
        return quantized, indices, jnp.zeros((), jnp.float32)
