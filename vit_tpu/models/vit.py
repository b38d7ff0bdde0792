"""ViT backbone + classifier (reference: train_vit.py:16-53).

TPU-native patch embedding: a stride=patch conv is exactly unfold+GEMM, so it is
implemented as a rearrange to per-patch vectors followed by a single Dense — one large
MXU matmul, which is what XLA would lower the conv to anyway, but without the conv
dimension bookkeeping (reference used nn.Conv2d, train_vit.py:34).

Layout: images are NHWC (TPU-native). The reference is NCHW; the data pipeline and the
torch<->orbax checkpoint converter handle the transpose.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from vit_tpu.core.config import TransformerConfig, transformer_configs
from vit_tpu.core.transformer import Transformer
from vit_tpu.utils.init import dense, normal_embed_init


@dataclasses.dataclass(eq=False)
class ViTConfig:
    """Mirror of the reference ViTConfig (train_vit.py:16-28).

    ``n_patches`` is derived in __post_init__ but stays overridable — the reference
    mutates it after construction for the TiTok decoder (train_titok.py:32).
    """

    image_size: int
    in_channels: int
    patch_size: int
    transformer: str
    extra_tokens: int
    dropout: float

    # TPU-native knobs threaded into the transformer config.
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    remat: bool = False
    quant: Optional[str] = None
    scan_layers: bool = False
    pp_stages: int = 0
    pp_microbatches: int = 0

    def __post_init__(self):
        self.n_patches = (self.image_size // self.patch_size) ** 2
        self.patch_dim = 3 * self.patch_size ** 2
        self.trans_config: TransformerConfig = transformer_configs[self.transformer](
            block_size=self.n_patches + self.extra_tokens,
            dropout=self.dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            quant=self.quant,
            scan_layers=self.scan_layers,
            pp_stages=self.pp_stages,
            pp_microbatches=self.pp_microbatches,
        )


class PatchEmbed(nn.Module):
    """Stride=patch conv as unfold+GEMM (≡ reference nn.Conv2d, train_vit.py:34)."""

    patch_size: int
    n_embd: int
    in_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = rearrange(x, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)", p1=p, p2=p)
        fan_in = p * p * self.in_channels
        return dense(self.n_embd, fan_in, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="proj")(x)


class ViT(nn.Module):
    """ViT backbone (reference train_vit.py:30-45): patch embed → +learned pos-emb →
    prepend ``extra_tokens`` learned embeddings → Transformer. Returns all tokens,
    extra tokens first (same token order as the reference's cat([extra, patch]))."""

    config: ViTConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        tc = cfg.trans_config
        patch_emb = PatchEmbed(
            cfg.patch_size, tc.n_embd, cfg.in_channels,
            dtype=tc.dtype, param_dtype=tc.param_dtype, name="patch_proj")(x)
        pos_emb = self.param("pos_emb", normal_embed_init,
                             (cfg.n_patches, tc.n_embd), tc.param_dtype)
        patch_emb = patch_emb + pos_emb.astype(tc.dtype)
        if cfg.extra_tokens > 0:
            extra_emb = self.param("extra_emb", normal_embed_init,
                                   (cfg.extra_tokens, tc.n_embd), tc.param_dtype)
            extra = jnp.broadcast_to(
                extra_emb.astype(tc.dtype)[None],
                (x.shape[0], cfg.extra_tokens, tc.n_embd))
            emb = jnp.concatenate([extra, patch_emb], axis=1)
        else:
            emb = patch_emb
        return Transformer(tc, name="transformer")(emb, deterministic)


class ViTClassifier(nn.Module):
    """Linear head on token 0 (reference train_vit.py:47-53)."""

    config: ViTConfig
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        tokens = ViT(self.config, name="vit")(x, deterministic)
        head = dense(self.num_classes, self.config.trans_config.n_embd,
                     dtype=jnp.float32, param_dtype=self.config.param_dtype,
                     name="head")
        return head(tokens[:, 0].astype(jnp.float32))
