"""LlamaGen-TiTok — TiTok over *discrete* VQGAN code sequences
(reference train_llamagen_titok.py:20-116).

The encoder consumes LlamaGen-VQGAN code indices (embedding + scaled-randn positional
parameter + latent slots), quantizes K latent tokens, and the decoder emits logits
over the frozen VQ codebook from learned mask tokens — i.e. a discrete-in/discrete-out
tokenizer compressor trained with cross-entropy.

Init parity: trunc_normal(std 0.02) on Linear/Embedding weights, zero biases, unit
LayerNorm (reference train_llamagen_titok.py:108-121).

The frozen LlamaGen VQ model itself is external to the reference repo (loaded from
checkpoints, train_llamagen_titok.py:140-155); in this framework any frozen tokenizer
with encode/decode_indices (e.g. vit_tpu ViT-VQGAN) can play that role — see
train_llamagen_titok.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_tpu.core.config import TransformerConfig, transformer_configs
from vit_tpu.core.transformer import Transformer
from vit_tpu.quantize.vq import Quantizer
from vit_tpu.utils.init import scaled_normal_init, trunc_normal_init


@dataclasses.dataclass(eq=False)
class LlamaGenTiTokConfig:
    """Mirror of the reference TiTokConfig (train_llamagen_titok.py:20-29)."""

    vq_codebook_size: int
    vq_latent_tokens: int
    latent_tokens: int
    codebook_size: int
    latent_dim: int
    transformer: str

    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    quant: Optional[str] = None
    remat: bool = False
    scan_layers: bool = False
    pp_stages: int = 0
    pp_microbatches: int = 0

    def __post_init__(self):
        self.trans_config: TransformerConfig = transformer_configs[self.transformer](
            block_size=self.vq_latent_tokens + self.latent_tokens, dropout=0.0,
            dtype=self.dtype, param_dtype=self.param_dtype,
            attn_impl=self.attn_impl, remat=self.remat,
            quant=self.quant, scan_layers=self.scan_layers,
            pp_stages=self.pp_stages, pp_microbatches=self.pp_microbatches)
        self.n_embd = self.trans_config.n_embd


def _dense_tn(features, dtype, param_dtype, name=None):
    """Linear with trunc_normal(0.02) weight + zero bias (reference init, :108-115)."""
    return nn.Dense(features, kernel_init=trunc_normal_init(0.02),
                    bias_init=nn.initializers.zeros, dtype=dtype,
                    param_dtype=param_dtype, name=name)


class LlamaGenTiTokEncoder(nn.Module):
    """Code ids → K latent vectors (reference train_llamagen_titok.py:32-50)."""

    config: LlamaGenTiTokConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        d = cfg.n_embd
        tok_emb = self.param("tok_emb", trunc_normal_init(0.02),
                             (cfg.vq_codebook_size, d), cfg.param_dtype)
        pos_emb = self.param("pos_emb", scaled_normal_init(d ** -0.5),
                             (cfg.vq_latent_tokens, d), cfg.param_dtype)
        extra_emb = self.param("extra_emb", trunc_normal_init(0.02),
                               (cfg.latent_tokens, d), cfg.param_dtype)
        inp = (jnp.take(tok_emb, x, axis=0)
               + pos_emb[None, : x.shape[1]]).astype(cfg.dtype)
        extra = jnp.broadcast_to(extra_emb.astype(cfg.dtype)[None],
                                 (x.shape[0], cfg.latent_tokens, d))
        emb = jnp.concatenate([extra, inp], axis=1)
        out = Transformer(cfg.trans_config, name="transformer")(emb, deterministic)
        latent = out[:, : cfg.latent_tokens]
        return _dense_tn(cfg.latent_dim, jnp.float32, cfg.param_dtype,
                         name="proj")(latent.astype(jnp.float32))


class LlamaGenTiTokDecoder(nn.Module):
    """K quantized latents → logits over the VQ codebook
    (reference train_llamagen_titok.py:69-88)."""

    config: LlamaGenTiTokConfig

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        cfg = self.config
        d = cfg.n_embd
        pos_emb = self.param("pos_emb", scaled_normal_init(d ** -0.5),
                             (cfg.latent_tokens, d), cfg.param_dtype)
        mask_tokens = self.param("mask_tokens", trunc_normal_init(0.02),
                                 (cfg.vq_latent_tokens, d), cfg.param_dtype)
        z_emb = (_dense_tn(d, cfg.dtype, cfg.param_dtype, name="quant_proj")(z)
                 + pos_emb[None, : z.shape[1]].astype(cfg.dtype))
        mask = jnp.broadcast_to(mask_tokens.astype(cfg.dtype)[None],
                                (z.shape[0], cfg.vq_latent_tokens, d))
        emb = jnp.concatenate([mask, z_emb], axis=1)
        out = Transformer(cfg.trans_config, name="transformer")(emb, deterministic)
        out = out[:, : cfg.vq_latent_tokens]
        return _dense_tn(cfg.vq_codebook_size, jnp.float32, cfg.param_dtype,
                         name="emb_proj")(out.astype(jnp.float32))


class LlamaGenTiTok(nn.Module):
    """Full token-space tokenizer (reference train_llamagen_titok.py:90-121)."""

    config: LlamaGenTiTokConfig

    def setup(self):
        cfg = self.config
        self.enc = LlamaGenTiTokEncoder(cfg)
        self.quant = Quantizer(cfg.codebook_size, cfg.latent_dim)
        self.dec = LlamaGenTiTokDecoder(cfg)

    def __call__(self, x, deterministic: bool = True
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """x: (B, vq_latent_tokens) int codes →
        (logits (B, vq_latent_tokens, vq_codebook_size), indices, quantize_loss)."""
        latent = self.enc(x, deterministic)
        quantized, indices, quantize_loss = self.quant(latent)
        logits = self.dec(quantized, deterministic)
        return logits, indices, quantize_loss

    def encode(self, x) -> jax.Array:
        return self.quant(self.enc(x))[1]

    def decode(self, z_quant) -> jax.Array:
        return self.dec(z_quant)

    def decode_indices(self, indices) -> jax.Array:
        return self.dec(self.quant.lookup(indices))
