"""Bytedance-style VectorQuantizer (reference blocks.py:405-505).

Differences from the author's minimal Quantizer (vit_tpu/quantize/vq.py):
  - optional L2 normalization (``use_l2_norm``); when enabled BOTH the looked-up
    codebook vector and the input are normalized before the losses/STE
    (blocks.py:446-449, 503-504 — the author's variant looks up un-normalized);
  - configurable commitment cost; result dict with commitment/codebook losses and
    ``min_encoding_indices`` (blocks.py:484-492);
  - optional ``clustering_vq``: EMA-usage-driven codebook reseeding. In the reference
    this calls an undefined ``gather()`` (blocks.py:457 — dead code, SURVEY.md §2d
    bug 4, an all-gather across data-parallel ranks upstream). Here the statistics are
    computed on the logically-global batch: under pjit/GSPMD the arrays ARE global and
    XLA inserts the collectives over the mesh — this is the working version of what
    blocks.py:454-477 attempted (SURVEY.md §2c).

fp32 throughout (reference forces fp32 via @autocast(enabled=False), blocks.py:428).

JAX functional form: the reference mutates ``embedding.weight.data`` in-place during
forward (blocks.py:477). Here the clustering update is returned in the result dict as
``new_embedding`` / the EMA usage lives in a ``vq_stats`` variable; the train step
installs ``new_embedding`` into params before the gradient update — same ordering as
torch (mutate during forward, optimizer step after).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_tpu.kernels.vq import nearest_code
from vit_tpu.quantize.vq import codebook_init


class BytedanceVectorQuantizer(nn.Module):
    codebook_size: int = 1024
    token_size: int = 256
    commitment_cost: float = 0.25
    use_l2_norm: bool = False
    clustering_vq: bool = False
    decay: float = 0.99

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """z: (B, K, token_size) -> (quantized STE (B, K, token_size) fp32, result)."""
        embedding = self.param("embedding", codebook_init(self.codebook_size),
                               (self.codebook_size, self.token_size), jnp.float32)
        z = z.astype(jnp.float32)
        z_flat = z.reshape(-1, self.token_size)
        unnormed_z_flat = z_flat

        indices = nearest_code(z_flat, embedding, l2_normalize=self.use_l2_norm)
        quantized = jnp.take(embedding, indices, axis=0)
        if self.use_l2_norm:
            quantized = quantized / jnp.maximum(
                jnp.linalg.norm(quantized, axis=-1, keepdims=True), 1e-12)
            z_flat = z_flat / jnp.maximum(
                jnp.linalg.norm(z_flat, axis=-1, keepdims=True), 1e-12)

        commitment_loss = self.commitment_cost * jnp.mean(
            (jax.lax.stop_gradient(quantized) - z_flat) ** 2)
        codebook_loss = jnp.mean((quantized - jax.lax.stop_gradient(z_flat)) ** 2)

        result: Dict[str, jax.Array] = dict(
            quantizer_loss=commitment_loss + codebook_loss,
            commitment_loss=commitment_loss,
            codebook_loss=codebook_loss,
            min_encoding_indices=indices.reshape(z.shape[:-1]),
        )

        if self.clustering_vq:
            embed_prob = self.variable("vq_stats", "embed_prob",
                                       jnp.zeros, (self.codebook_size,), jnp.float32)
            if train:
                # EMA usage (blocks.py:461-465). Under pjit the batch is global, so
                # this mean IS the cross-replica statistic (no explicit gather).
                onehot_mean = jnp.zeros((self.codebook_size,), jnp.float32
                                        ).at[indices].add(1.0) / indices.shape[0]
                new_prob = embed_prob.value * self.decay + onehot_mean * (1 - self.decay)
                embed_prob.value = new_prob
                # Closest-sampling reseed (blocks.py:466-477): for every code, take
                # the nearest input vector; dead codes move toward real data.
                d = (jnp.sum(z_flat ** 2, 1, keepdims=True)
                     + jnp.sum((embedding / jnp.maximum(jnp.linalg.norm(
                         embedding, axis=-1, keepdims=True), 1e-12)
                         if self.use_l2_norm else embedding) ** 2, 1)
                     - 2.0 * z_flat @ (embedding.T if not self.use_l2_norm else
                                       (embedding / jnp.maximum(jnp.linalg.norm(
                                           embedding, axis=-1, keepdims=True),
                                           1e-12)).T))
                nearest_input = jnp.argmin(d, axis=0)          # (C,)
                random_feat = jax.lax.stop_gradient(
                    jnp.take(unnormed_z_flat, nearest_input, axis=0))
                decay_f = jnp.exp(-(new_prob * self.codebook_size * 10.0)
                                  / (1 - self.decay) - 1e-3)[:, None]
                result["new_embedding"] = (embedding * (1 - decay_f)
                                           + random_feat * decay_f)

        quantized = z_flat + jax.lax.stop_gradient(quantized - z_flat)  # STE
        return quantized.reshape(z.shape), result

    def get_codebook_entry(self, indices: jax.Array) -> jax.Array:
        """Index → (normalized, if use_l2_norm) codebook vector (blocks.py:496-505)."""
        embedding = self.get_variable("params", "embedding")
        out = jnp.take(embedding, indices, axis=0)
        if self.use_l2_norm:
            out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True),
                                    1e-12)
        return out
