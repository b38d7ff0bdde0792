"""TATiTok — the Bytedance-blocks-parity TiTok variant
(reference blocks.py:208-403 + train_tatitok.py:31-93).

Structural elements reproduced (vs the author's minimal TiTok):
  - a learned latent-token BANK owned by the wrapper and passed into the encoder
    (train_tatitok.py:45-46);
  - class embedding prepended to patches, separate positional embeddings for
    patches+cls and for latent tokens, ln_pre / ln_post affine LayerNorms
    (blocks.py:239-252);
  - decoder with a single broadcast mask token + class embedding, depth-to-space FFN
    and a REAL 3×3 conv_out (blocks.py:330-361 — present here, commented out in the
    author's variant);
  - TATiTokDecoder: projected text-guidance tokens with their own positional
    embedding appended to the sequence (blocks.py:364-403);
  - BytedanceVectorQuantizer with use_l2_norm and optional clustering
    (vit_tpu/quantize/bytedance_vq.py);
  - trunc_normal(0.02) init for Linear/Conv/Embedding (train_tatitok.py:56-69).

The Bytedance LND permutes (blocks.py:268-271) are cuDNN-isms and are not reproduced:
batch-first (B, S, D) throughout — same math.

Transformer presets: small=8L/8H/512, base=12L/12H/768, large=24L/16H/1024
(blocks.py:219-233) via vit_tpu.core.config.bytedance_config.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from vit_tpu.core.config import bytedance_config, BYTEDANCE_WIDTH
from vit_tpu.core.transformer import Transformer
from vit_tpu.quantize.bytedance_vq import BytedanceVectorQuantizer
from vit_tpu.utils.init import scaled_normal_init, trunc_normal_init


@dataclasses.dataclass(eq=False)
class TATiTokConfig:
    """Mirror of the reference TiTokConfig (train_tatitok.py:22-30) + the TA text
    fields (blocks.py:367-369 defaults)."""

    image_size: int
    patch_size: int
    latent_tokens: int
    codebook_size: int
    latent_dim: int
    transformer: str               # "small" | "base" | "large"
    use_l2_norm: bool = True
    clustering_vq: bool = False
    text_guidance: bool = False
    text_context_length: int = 77
    text_embed_dim: int = 768

    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    remat: bool = False
    quant: Optional[str] = None
    scan_layers: bool = False
    pp_stages: int = 0
    pp_microbatches: int = 0

    def __post_init__(self):
        self.grid_size = self.image_size // self.patch_size
        self.width = BYTEDANCE_WIDTH[self.transformer]
        seq = self.grid_size ** 2 + 1 + self.latent_tokens
        if self.text_guidance:
            seq += self.text_context_length
        self.trans_config = bytedance_config(
            self.transformer, block_size=seq, dropout=0.0, dtype=self.dtype,
            param_dtype=self.param_dtype, attn_impl=self.attn_impl,
            remat=self.remat, quant=self.quant, scan_layers=self.scan_layers,
            pp_stages=self.pp_stages, pp_microbatches=self.pp_microbatches)


def _conv_tn(features, kernel, dtype, param_dtype, name=None, strides=None,
             padding="SAME"):
    return nn.Conv(features, kernel, strides=strides, padding=padding,
                   kernel_init=trunc_normal_init(0.02),
                   bias_init=nn.initializers.zeros,
                   dtype=dtype, param_dtype=param_dtype, name=name)


def _dense_tn(features, dtype, param_dtype, name=None):
    return nn.Dense(features, kernel_init=trunc_normal_init(0.02),
                    bias_init=nn.initializers.zeros, dtype=dtype,
                    param_dtype=param_dtype, name=name)


def _ln(param_dtype, name=None):
    return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=param_dtype,
                        name=name)


class TATiTokEncoder(nn.Module):
    """Image + latent bank → (B, K, token_size) latents (reference blocks.py:208-282)."""

    config: TATiTokConfig

    @nn.compact
    def __call__(self, pixel_values, latent_tokens, deterministic: bool = True):
        cfg = self.config
        w = cfg.width
        scale = w ** -0.5
        b = pixel_values.shape[0]
        p = cfg.patch_size

        x = rearrange(pixel_values, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p, p2=p)
        x = _dense_tn(w, cfg.dtype, cfg.param_dtype, name="patch_embed")(x)

        class_emb = self.param("class_embedding", scaled_normal_init(scale),
                               (1, w), cfg.param_dtype)
        pos_emb = self.param("positional_embedding", scaled_normal_init(scale),
                             (cfg.grid_size ** 2 + 1, w), cfg.param_dtype)
        latent_pos = self.param("latent_token_positional_embedding",
                                scaled_normal_init(scale),
                                (cfg.latent_tokens, w), cfg.param_dtype)

        cls = jnp.broadcast_to(class_emb.astype(cfg.dtype)[None], (b, 1, w))
        x = jnp.concatenate([cls, x], axis=1) + pos_emb.astype(cfg.dtype)[None]

        lat = (jnp.broadcast_to(latent_tokens.astype(cfg.dtype)[None],
                                (b, cfg.latent_tokens, w))
               + latent_pos.astype(cfg.dtype)[None])
        x = jnp.concatenate([x, lat], axis=1)

        x = _ln(cfg.param_dtype, name="ln_pre")(x).astype(cfg.dtype)
        x = Transformer(cfg.trans_config, name="transformer")(x, deterministic)
        lat_out = x[:, 1 + cfg.grid_size ** 2:]
        lat_out = _ln(cfg.param_dtype, name="ln_post")(lat_out)
        # 1×1 conv_out ≡ Dense (reference blocks.py:252, 279-281)
        return _dense_tn(cfg.latent_dim, jnp.float32, cfg.param_dtype,
                         name="conv_out")(lat_out.astype(jnp.float32))


class TATiTokDecoder(nn.Module):
    """Quantized latents (+ optional text guidance) → image
    (reference blocks.py:285-361; text path blocks.py:364-403)."""

    config: TATiTokConfig

    @nn.compact
    def __call__(self, z_quantized, text_guidance=None, deterministic: bool = True):
        cfg = self.config
        w = cfg.width
        scale = w ** -0.5
        p = cfg.patch_size
        b, seq_len, _ = z_quantized.shape
        grid2 = cfg.grid_size ** 2

        x = _dense_tn(w, cfg.dtype, cfg.param_dtype, name="decoder_embed")(
            z_quantized.astype(cfg.dtype))

        class_emb = self.param("class_embedding", scaled_normal_init(scale),
                               (1, w), cfg.param_dtype)
        pos_emb = self.param("positional_embedding", scaled_normal_init(scale),
                             (grid2 + 1, w), cfg.param_dtype)
        mask_token = self.param("mask_token", scaled_normal_init(scale),
                                (1, 1, w), cfg.param_dtype)
        latent_pos = self.param("latent_token_positional_embedding",
                                scaled_normal_init(scale),
                                (cfg.latent_tokens, w), cfg.param_dtype)

        mask = jnp.broadcast_to(mask_token.astype(cfg.dtype), (b, grid2, w))
        cls = jnp.broadcast_to(class_emb.astype(cfg.dtype)[None], (b, 1, w))
        mask = jnp.concatenate([cls, mask], axis=1) + pos_emb.astype(cfg.dtype)[None]
        x = x + latent_pos.astype(cfg.dtype)[None, :seq_len]
        x = jnp.concatenate([mask, x], axis=1)

        if cfg.text_guidance:
            if text_guidance is None:
                raise ValueError("text_guidance tensor required (B, ctx, text_dim)")
            text_pos = self.param("text_guidance_positional_embedding",
                                  scaled_normal_init(scale),
                                  (cfg.text_context_length, w), cfg.param_dtype)
            tg = _dense_tn(w, cfg.dtype, cfg.param_dtype,
                           name="text_guidance_proj")(
                               text_guidance.astype(cfg.dtype))
            tg = tg + text_pos.astype(cfg.dtype)[None]
            x = jnp.concatenate([x, tg], axis=1)

        x = _ln(cfg.param_dtype, name="ln_pre")(x).astype(cfg.dtype)
        x = Transformer(cfg.trans_config, name="transformer")(x, deterministic)
        x = x[:, 1:1 + grid2]                       # drop cls, keep grid outputs
        x = _ln(cfg.param_dtype, name="ln_post")(x).astype(jnp.float32)
        # depth-to-space FFN (blocks.py:356-359) + real 3×3 conv_out (blocks.py:360)
        img = _dense_tn(p * p * 3, jnp.float32, cfg.param_dtype, name="ffn")(x)
        img = rearrange(img, "b (h w) (p1 p2 c) -> b (h p1) (w p2) c",
                        h=cfg.grid_size, p1=p, p2=p)
        return _conv_tn(3, (3, 3), jnp.float32, cfg.param_dtype,
                        name="conv_out")(img)


class TATiTok(nn.Module):
    """Full wrapper with latent bank + Bytedance VQ (reference train_tatitok.py:31-93)."""

    config: TATiTokConfig

    def setup(self):
        cfg = self.config
        self.encoder = TATiTokEncoder(cfg)
        self.decoder = TATiTokDecoder(cfg)
        self.latent_tokens = self.param(
            "latent_tokens", scaled_normal_init(cfg.width ** -0.5),
            (cfg.latent_tokens, cfg.width), cfg.param_dtype)
        self.quantize = BytedanceVectorQuantizer(
            codebook_size=cfg.codebook_size, token_size=cfg.latent_dim,
            commitment_cost=0.25, use_l2_norm=cfg.use_l2_norm,
            clustering_vq=cfg.clustering_vq)

    def encode(self, x, train: bool = False
               ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        z = self.encoder(x, self.latent_tokens, not train)
        return self.quantize(z, train)

    def decode(self, z_quantized, text_guidance=None, train: bool = False):
        return self.decoder(z_quantized, text_guidance, not train)

    def decode_tokens(self, tokens, text_guidance=None):
        """Code indices (B, K) → image (reference train_tatitok.py:82-89)."""
        z = self.quantize.get_codebook_entry(tokens.reshape(-1)).reshape(
            tokens.shape[0], tokens.shape[-1], -1)
        return self.decode(z, text_guidance)

    def __call__(self, x, text_guidance=None, train: bool = False
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        z_quantized, result_dict = self.encode(x, train)
        decoded = self.decode(z_quantized, text_guidance, train)
        return decoded, result_dict
