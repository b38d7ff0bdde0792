"""ViT-VQGAN — per-patch tokenizer (reference train_vit_vqgan.py:18-91).

Same skeleton as TiTok but one latent per patch: latent_tokens = n_patches, the
encoder ViT has zero extra tokens and ALL its outputs are projected to latent_dim
(train_vit_vqgan.py:38-43); the decoder ViT likewise has zero extra tokens and decodes
every latent position back to a patch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from vit_tpu.models.vit import ViT, ViTConfig
from vit_tpu.quantize.vq import FSQ, Quantizer
from vit_tpu.utils.init import dense


@dataclasses.dataclass(eq=False)
class ViTVQGANConfig:
    """Mirror of the reference ViTVQGANConfig (train_vit_vqgan.py:18-32)."""

    image_size: int
    patch_size: int
    codebook_size: int
    latent_dim: int
    transformer: str

    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    quant: Optional[str] = None
    remat: bool = False
    quantizer: str = "vq"
    fsq_levels: Optional[Tuple[int, ...]] = None
    scan_layers: bool = False
    pp_stages: int = 0
    pp_microbatches: int = 0

    def __post_init__(self):
        self.grid_size = self.image_size // self.patch_size
        self.n_patches = self.grid_size ** 2
        self.latent_tokens = self.n_patches
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  attn_impl=self.attn_impl, remat=self.remat,
                  quant=self.quant, scan_layers=self.scan_layers,
                  pp_stages=self.pp_stages,
                  pp_microbatches=self.pp_microbatches)
        self.enc_vit_config = ViTConfig(self.image_size, 3, self.patch_size,
                                        self.transformer, 0, 0.0, **kw)
        self.n_embd = self.enc_vit_config.trans_config.n_embd
        self.dec_vit_config = ViTConfig(self.latent_tokens, self.n_embd, 1,
                                        self.transformer, 0, 0.0, **kw)
        self.dec_vit_config.n_patches = self.latent_tokens
        self.dec_vit_config.trans_config = self.dec_vit_config.trans_config.replace(
            block_size=self.latent_tokens)


class ViTVQGANEncoder(nn.Module):
    """Image → one latent per patch (reference train_vit_vqgan.py:34-43)."""

    config: ViTVQGANConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        out = ViT(cfg.enc_vit_config, name="vit")(x, deterministic)
        return dense(cfg.latent_dim, cfg.n_embd, dtype=jnp.float32,
                     param_dtype=cfg.param_dtype, name="proj")(
                         out.astype(jnp.float32))


class ViTVQGANDecoder(nn.Module):
    """Per-patch latents → image (reference train_vit_vqgan.py:61-77)."""

    config: ViTVQGANConfig

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        cfg = self.config
        p = cfg.patch_size
        z = dense(cfg.n_embd, cfg.latent_dim, dtype=cfg.dtype,
                  param_dtype=cfg.param_dtype, name="quant_proj")(z)
        z = rearrange(z, "b k c -> b k 1 c")
        out = ViT(cfg.dec_vit_config, name="vit")(z, deterministic)
        out = out[:, :cfg.n_patches]
        out = rearrange(out, "b (h w) c -> b h w c", h=cfg.grid_size, w=cfg.grid_size)
        img = dense(3 * p * p, cfg.n_embd, dtype=jnp.float32,
                    param_dtype=cfg.param_dtype, name="embd_proj")(
                        out.astype(jnp.float32))
        return rearrange(img, "b h w (p1 p2 c) -> b (h p1) (w p2) c", p1=p, p2=p)


class ViTVQGAN(nn.Module):
    """Full model (reference train_vit_vqgan.py:79-91)."""

    config: ViTVQGANConfig

    def setup(self):
        cfg = self.config
        self.encoder = ViTVQGANEncoder(cfg)
        if cfg.quantizer == "fsq":
            levels = cfg.fsq_levels or (8,) * cfg.latent_dim
            self.quant = FSQ(levels=levels)
        else:
            self.quant = Quantizer(cfg.codebook_size, cfg.latent_dim)
        self.decoder = ViTVQGANDecoder(cfg)

    def __call__(self, x, deterministic: bool = True):
        latent = self.encoder(x, deterministic)
        quantized, indices, quantize_loss = self.quant(latent)
        recon = self.decoder(quantized, deterministic)
        return recon, indices, quantize_loss

    def encode(self, x) -> jax.Array:
        return self.quant(self.encoder(x))[1]

    def decode(self, z_quant) -> jax.Array:
        return self.decoder(z_quant)

    def decode_indices(self, indices) -> jax.Array:
        return self.decoder(self.quant.lookup(indices))
