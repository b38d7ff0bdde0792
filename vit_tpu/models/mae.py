"""MAE — Masked Autoencoder pretraining (He et al., arXiv 2111.06377).

The reference lists MAE on its paper checklist (reference README.md:8) but ships no
code for it; SURVEY.md records the absence. This module completes the reference's
stated goal — "reproduce many of the ViT based papers with just a few lines of code"
(reference README.md:3) — on the same shared transformer core.

TPU-native design notes:
  - Random masking is static-shape: per image we argsort a uniform noise vector and
    keep the first ``len_keep`` patch indices (a fixed count derived from
    ``mask_ratio`` at config time), so the encoder always sees the same token count
    and XLA compiles one program. ``jnp.take_along_axis`` does the gather — no
    dynamic shapes, no host round-trips.
  - Positional information is fixed 2-D sin/cos (as in the paper), so masking cannot
    leak position through learned embeddings; reuses the reference-parity helper
    from the enhancing-VQGAN port (reference train_enhancing_vitvqgan.py:40-87).
  - Encoder runs only on visible tokens (25% of the sequence at the default 0.75
    mask ratio) — the pretraining FLOP win that makes MAE "scalable" applies
    directly to the MXU: the attention/MLP matmuls shrink by 4x.
  - The decoder unshuffles via a second ``take_along_axis`` over ``ids_restore``
    (scatter expressed as gather — TPU-friendly) and predicts raw patch pixels.

Loss lives in ``vit_tpu.train.step.make_mae_train_step`` (masked-patch MSE with
optional per-patch target normalization, ``norm_pix``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from vit_tpu.core.config import TransformerConfig, transformer_configs
from vit_tpu.core.transformer import Transformer
from vit_tpu.models.enhancing_vqgan import sincos_2d_pos_embed
from vit_tpu.models.vit import PatchEmbed
from vit_tpu.utils.init import dense, normal_embed_init


@dataclasses.dataclass(eq=False)
class MAEConfig:
    """MAE hyperparameters. Encoder follows the shared S/B/L presets; the decoder is
    the paper's lightweight 8-layer/512-dim default, configurable."""

    image_size: int
    in_channels: int = 3
    patch_size: int = 16
    transformer: str = "B"          # encoder preset (S/B/L, core/config.py)
    mask_ratio: float = 0.75
    decoder_layers: int = 8
    decoder_heads: int = 16
    decoder_embd: int = 512
    dropout: float = 0.0
    norm_pix: bool = True           # per-patch-normalized pixel targets (paper §A.1)

    # TPU-native knobs (same surface as ViTConfig)
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
        self.grid_size = self.image_size // self.patch_size
        self.patch_dim = self.in_channels * self.patch_size ** 2
        self.len_keep = max(1, int(round(self.n_patches * (1.0 - self.mask_ratio))))
        # +1: cls token rides along in both stacks
        self.enc_config: TransformerConfig = transformer_configs[self.transformer](
            block_size=self.len_keep + 1, dropout=self.dropout, dtype=self.dtype,
            param_dtype=self.param_dtype, attn_impl=self.attn_impl, remat=self.remat,
            quant=self.quant, scan_layers=self.scan_layers,
            pp_stages=self.pp_stages, pp_microbatches=self.pp_microbatches)
        self.dec_config = TransformerConfig(
            n_layers=self.decoder_layers, n_heads=self.decoder_heads,
            n_embd=self.decoder_embd, block_size=self.n_patches + 1,
            dropout=self.dropout, dtype=self.dtype, param_dtype=self.param_dtype,
            attn_impl=self.attn_impl, remat=self.remat, quant=self.quant,
            scan_layers=self.scan_layers,
            pp_stages=self.pp_stages, pp_microbatches=self.pp_microbatches)


def random_masking(rng, batch: int, n: int, len_keep: int):
    """Per-image random patch masking via noise argsort (static shapes).

    Returns ``ids_keep (b, len_keep)`` — indices of visible patches,
    ``ids_restore (b, n)`` — inverse permutation used to unshuffle the decoder
    sequence, and ``mask (b, n)`` — 1.0 where the patch was masked (removed).
    """
    noise = jax.random.uniform(rng, (batch, n))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    mask = jnp.ones((batch, n), jnp.float32).at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return ids_keep, ids_restore, mask


def patchify(images, patch_size: int):
    """(b, H, W, C) -> (b, n_patches, p*p*C), matching PatchEmbed's token order."""
    return rearrange(images, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                     p1=patch_size, p2=patch_size)


def unpatchify(patches, patch_size: int, grid_size: int, in_channels: int = 3):
    """Inverse of :func:`patchify`: (b, n, p*p*C) -> (b, H, W, C)."""
    return rearrange(patches, "b (h w) (p1 p2 c) -> b (h p1) (w p2) c",
                     h=grid_size, w=grid_size, p1=patch_size, p2=patch_size,
                     c=in_channels)


class MAEEncoder(nn.Module):
    """Patch embed + fixed sincos pos-emb -> keep visible tokens -> cls -> ViT."""

    config: MAEConfig

    @nn.compact
    def __call__(self, images, ids_keep, deterministic: bool = True):
        cfg = self.config
        tc = cfg.enc_config
        x = PatchEmbed(cfg.patch_size, tc.n_embd, cfg.in_channels,
                       dtype=tc.dtype, param_dtype=tc.param_dtype,
                       name="patch_proj")(images)
        pos = jnp.asarray(sincos_2d_pos_embed(tc.n_embd, cfg.grid_size), tc.dtype)
        x = x + pos[None]
        x = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
        cls = self.param("cls_token", normal_embed_init, (1, tc.n_embd),
                         tc.param_dtype)
        cls = jnp.broadcast_to(cls.astype(tc.dtype)[None], (x.shape[0], 1, tc.n_embd))
        x = jnp.concatenate([cls, x], axis=1)
        return Transformer(tc, name="transformer")(x, deterministic)


class MAEDecoder(nn.Module):
    """Project to decoder width, unshuffle with mask tokens, predict patch pixels."""

    config: MAEConfig

    @nn.compact
    def __call__(self, latent, ids_restore, deterministic: bool = True):
        cfg = self.config
        dc = cfg.dec_config
        x = dense(dc.n_embd, cfg.enc_config.n_embd, dtype=dc.dtype,
                  param_dtype=dc.param_dtype, name="embed")(latent)
        b = x.shape[0]
        mask_token = self.param("mask_token", normal_embed_init, (1, dc.n_embd),
                                dc.param_dtype)
        n_masked = cfg.n_patches - cfg.len_keep
        mask_tokens = jnp.broadcast_to(mask_token.astype(dc.dtype)[None],
                                       (b, n_masked, dc.n_embd))
        # visible patch tokens (sans cls) ++ mask tokens, unshuffled back to the
        # original patch order — scatter expressed as gather over ids_restore
        x_ = jnp.concatenate([x[:, 1:], mask_tokens], axis=1)
        x_ = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)
        pos = jnp.asarray(sincos_2d_pos_embed(dc.n_embd, cfg.grid_size), dc.dtype)
        x_ = x_ + pos[None]
        x = jnp.concatenate([x[:, :1], x_], axis=1)   # cls keeps no pos (index 0)
        x = Transformer(dc, name="transformer")(x, deterministic)
        pred = dense(cfg.patch_dim, dc.n_embd, dtype=jnp.float32,
                     param_dtype=dc.param_dtype, name="pred")(
                         x[:, 1:].astype(jnp.float32))
        return pred


class MAE(nn.Module):
    """Full masked autoencoder. ``__call__`` consumes a ``mask`` PRNG stream
    (``rngs={"mask": key, "dropout": key}``) and returns ``(pred, mask)`` with
    ``pred (b, n_patches, patch_dim)`` in fp32 and ``mask (b, n_patches)``
    flagging the reconstructed (masked) patches."""

    config: MAEConfig

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        cfg = self.config
        rng = self.make_rng("mask")
        ids_keep, ids_restore, mask = random_masking(
            rng, images.shape[0], cfg.n_patches, cfg.len_keep)
        latent = MAEEncoder(cfg, name="encoder")(images, ids_keep, deterministic)
        pred = MAEDecoder(cfg, name="decoder")(latent, ids_restore, deterministic)
        return pred, mask

    def reconstruct(self, images, deterministic: bool = True):
        """Full image paste-up for eval grids: masked patches from the prediction,
        visible patches from the input (the paper's visualization convention)."""
        pred, mask = self(images, deterministic)
        target = patchify(images.astype(jnp.float32), self.config.patch_size)
        mixed = jnp.where(mask[:, :, None] > 0, pred, target)
        return unpatchify(mixed, self.config.patch_size, self.config.grid_size,
                          self.config.in_channels), mask


def mae_loss(pred, images, mask, patch_size: int, norm_pix: bool = True):
    """Masked-patch MSE (paper eq. — mean over masked patches only). With
    ``norm_pix`` the target is per-patch standardized (paper §A.1)."""
    target = patchify(images.astype(jnp.float32), patch_size)
    if norm_pix:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mean) / jnp.sqrt(var + 1e-6)
    per_patch = jnp.mean((pred - target) ** 2, axis=-1)
    return (per_patch * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def load_encoder_into_vit(mae_params, vit_params):
    """Initialize a ``ViTClassifier`` param tree from a pretrained MAE encoder —
    the MAE fine-tuning recipe. Transfers the patch projection, transformer stack
    and cls token (MAE ``cls_token`` -> ViT ``extra_emb`` slot 0); the ViT's learned
    ``pos_emb`` and the classifier head keep their fresh init (MAE's sincos tables
    are constants, and the ViT adds pos-emb before prepending extra tokens, so the
    learned table starting at zero-mean noise is the clean hand-off).

    Works on raw nested-dict param trees; returns a new tree, inputs untouched.
    """
    import copy

    from vit_tpu.core.transformer import match_stack_layout

    new = copy.deepcopy(vit_params)
    enc = mae_params["encoder"]
    vit = new["vit"]
    vit["patch_proj"] = copy.deepcopy(enc["patch_proj"])
    # normalize to the target's stack layout so a pretrain and a fine-tune may
    # disagree on scan_layers / pp_stages (core/transformer.py)
    vit["transformer"] = match_stack_layout(
        copy.deepcopy(enc["transformer"]), vit["transformer"])
    if "extra_emb" in vit:
        cls = jnp.asarray(enc["cls_token"])          # (1, n_embd)
        vit["extra_emb"] = jnp.asarray(vit["extra_emb"]).at[0].set(cls[0])
    return new
