"""TiTok 1-D image tokenizer — author's variant (reference train_titok.py:18-93).

Encoder: ViT over the image with K latent slots prepended as extra tokens; keep the K
latent outputs; project to latent_dim. Quantizer: minimal L2-norm VQ (fused Pallas
lookup). Decoder: project codes back to n_embd, feed them to a ViT as a (K, 1) "image"
with patch_size 1 whose extra tokens are n_patches learned mask slots; the mask-slot
outputs become image patches via a 1×1 projection + depth-to-space.

NHWC layout; the quantizer runs in fp32 inside the bf16 graph.
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
class TiTokConfig:
    """Mirror of the reference TiTokConfig (train_titok.py:18-32)."""

    image_size: int
    patch_size: int
    latent_tokens: int
    codebook_size: int
    latent_dim: int
    transformer: str

    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    remat: bool = False
    quant: Optional[str] = None
    scan_layers: bool = False
    pp_stages: int = 0
    pp_microbatches: int = 0
    quantizer: str = "vq"          # "vq" | "fsq" (the reference's intended-but-unwired
                                   # FSQ variant, SURVEY.md §2d quirk 8)
    fsq_levels: Optional[Tuple[int, ...]] = None

    def __post_init__(self):
        self.grid_size = self.image_size // self.patch_size
        self.n_patches = self.grid_size ** 2
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  attn_impl=self.attn_impl, remat=self.remat, quant=self.quant,
                  scan_layers=self.scan_layers, pp_stages=self.pp_stages,
                  pp_microbatches=self.pp_microbatches)
        # encoder ViT: image + K latent slots (reference train_titok.py:29)
        self.enc_vit_config = ViTConfig(self.image_size, 3, self.patch_size,
                                        self.transformer, self.latent_tokens, 0.0, **kw)
        self.n_embd = self.enc_vit_config.trans_config.n_embd
        # decoder ViT: latents as a (K, 1) image, patch 1, n_patches mask slots
        # (reference train_titok.py:31-32; n_patches overridden to K). The reference
        # leaves the decoder block_size at K²+extra — an unused-field artifact of its
        # mask buffer; here block_size reflects the true sequence length.
        self.dec_vit_config = ViTConfig(self.latent_tokens, self.n_embd, 1,
                                        self.transformer, self.n_patches, 0.0, **kw)
        self.dec_vit_config.n_patches = self.latent_tokens
        self.dec_vit_config.trans_config = self.dec_vit_config.trans_config.replace(
            block_size=self.latent_tokens + self.n_patches)


class TiTokEncoder(nn.Module):
    """Image → K latent vectors (reference train_titok.py:34-43)."""

    config: TiTokConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        out = ViT(cfg.enc_vit_config, name="vit")(x, deterministic)
        latent = out[:, :cfg.latent_tokens]
        return dense(cfg.latent_dim, cfg.n_embd, dtype=jnp.float32,
                     param_dtype=cfg.param_dtype, name="proj")(
                         latent.astype(jnp.float32))


class TiTokDecoder(nn.Module):
    """K quantized latents → image (reference train_titok.py:61-77)."""

    config: TiTokConfig

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        cfg = self.config
        p = cfg.patch_size
        z = dense(cfg.n_embd, cfg.latent_dim, dtype=cfg.dtype,
                  param_dtype=cfg.param_dtype, name="quant_proj")(z)
        z = rearrange(z, "b k c -> b k 1 c")      # latents as a (K, 1) NHWC image
        out = ViT(cfg.dec_vit_config, name="vit")(z, deterministic)
        out = out[:, :cfg.n_patches]               # the mask-slot outputs
        out = rearrange(out, "b (h w) c -> b h w c", h=cfg.grid_size, w=cfg.grid_size)
        # 1×1 conv ≡ Dense over channels (reference embd_proj, train_titok.py:64)
        img = dense(3 * p * p, cfg.n_embd, dtype=jnp.float32,
                    param_dtype=cfg.param_dtype, name="embd_proj")(
                        out.astype(jnp.float32))
        return rearrange(img, "b h w (p1 p2 c) -> b (h p1) (w p2) c", p1=p, p2=p)


class TiTok(nn.Module):
    """Full tokenizer (reference train_titok.py:79-93)."""

    config: TiTokConfig

    def setup(self):
        cfg = self.config
        self.enc = TiTokEncoder(cfg)
        if cfg.quantizer == "fsq":
            levels = cfg.fsq_levels or (8,) * cfg.latent_dim
            self.quant = FSQ(levels=levels)
        else:
            self.quant = Quantizer(cfg.codebook_size, cfg.latent_dim)
        self.dec = TiTokDecoder(cfg)

    def __call__(self, x, deterministic: bool = True):
        latent = self.enc(x, deterministic)
        quantized, indices, quantize_loss = self.quant(latent)
        recon = self.dec(quantized, deterministic)
        return recon, indices, quantize_loss

    def encode(self, x) -> jax.Array:
        """Image → code indices (reference train_titok.py:86)."""
        return self.quant(self.enc(x))[1]

    def decode(self, z_quant) -> jax.Array:
        return self.dec(z_quant)

    def decode_indices(self, indices) -> jax.Array:
        """Code indices → image (reference train_titok.py:88)."""
        return self.dec(self.quant.lookup(indices))
