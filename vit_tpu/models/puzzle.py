"""Puzzle — masked position prediction pretraining (MP3, arXiv 2207.07611).

The reference lists this paper ("Puzzle — Position Prediction as an Effective
Pretraining Task") on its checklist (reference README.md:9) but ships no code for
it. Like MAE (vit_tpu/models/mae.py) this module completes the checklist item on
the shared transformer core.

The pretext task: every patch contributes its *content* embedding, but only a
random (1 − mask_ratio) fraction receives its *position* embedding; the model must
classify, for each position-less patch, which of the ``n_patches`` grid positions
it came from — solving the jigsaw. Loss/accuracy live in
``vit_tpu.train.step.make_puzzle_train_step``.

TPU-native notes: the same static-shape argsort masking as MAE (the pos-emb table
is zeroed per token by a multiplicative mask — no gathers needed since the full
sequence is always encoded), one dense fp32 classification head over positions.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from vit_tpu.core.config import TransformerConfig, transformer_configs
from vit_tpu.core.transformer import Transformer
from vit_tpu.models.mae import random_masking
from vit_tpu.models.vit import PatchEmbed
from vit_tpu.utils.init import dense, normal_embed_init


@dataclasses.dataclass(eq=False)
class PuzzleConfig:
    """``mask_ratio`` = fraction of patches stripped of their position embedding
    (the prediction targets). Encoder follows the shared S/B/L presets."""

    image_size: int
    in_channels: int = 3
    patch_size: int = 16
    transformer: str = "B"
    mask_ratio: float = 0.75
    dropout: float = 0.0

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
        self.len_keep = max(1, int(round(self.n_patches * (1.0 - self.mask_ratio))))
        self.trans_config: TransformerConfig = transformer_configs[self.transformer](
            block_size=self.n_patches, dropout=self.dropout, dtype=self.dtype,
            param_dtype=self.param_dtype, attn_impl=self.attn_impl,
            remat=self.remat, quant=self.quant, scan_layers=self.scan_layers,
            pp_stages=self.pp_stages, pp_microbatches=self.pp_microbatches)


class Puzzle(nn.Module):
    """Returns ``(logits, mask)``: ``logits (b, n_patches, n_patches)`` — per-token
    position classification in fp32 — and ``mask (b, n_patches)`` with 1.0 on the
    position-less tokens (the ones that are scored). Consumes a ``mask`` PRNG
    stream like MAE."""

    config: PuzzleConfig

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        cfg = self.config
        tc = cfg.trans_config
        x = PatchEmbed(cfg.patch_size, tc.n_embd, cfg.in_channels,
                       dtype=tc.dtype, param_dtype=tc.param_dtype,
                       name="patch_proj")(images)
        rng = self.make_rng("mask")
        _, _, mask = random_masking(rng, images.shape[0], cfg.n_patches,
                                    cfg.len_keep)
        pos = self.param("pos_emb", normal_embed_init,
                         (cfg.n_patches, tc.n_embd), tc.param_dtype)
        x = x + pos.astype(tc.dtype)[None] * (1.0 - mask)[:, :, None].astype(tc.dtype)
        x = Transformer(tc, name="transformer")(x, deterministic)
        logits = dense(cfg.n_patches, tc.n_embd, dtype=jnp.float32,
                       param_dtype=tc.param_dtype, name="head")(
                           x.astype(jnp.float32))
        return logits, mask


def load_puzzle_into_vit(puzzle_params, vit_params):
    """Initialize a ``ViTClassifier`` param tree from a pretrained Puzzle model.
    Unlike MAE, Puzzle keeps the full ViT shape — patch projection, learned
    pos-emb table and transformer stack all transfer; only the ViT's extra-token
    embeddings and classifier head keep their fresh init."""
    import copy

    from vit_tpu.core.transformer import match_stack_layout

    new = copy.deepcopy(vit_params)
    vit = new["vit"]
    vit["patch_proj"] = copy.deepcopy(puzzle_params["patch_proj"])
    # normalize to the target's stack layout (see mae.load_encoder_into_vit)
    vit["transformer"] = match_stack_layout(
        copy.deepcopy(puzzle_params["transformer"]), vit["transformer"])
    vit["pos_emb"] = jnp.asarray(puzzle_params["pos_emb"])
    return new


def puzzle_loss(logits, mask):
    """Masked-token position cross-entropy + accuracy. The target for token i is
    its own grid index i (tokens are fed in raster order; only their pos-embs were
    withheld)."""
    import optax

    n = logits.shape[1]
    targets = jnp.broadcast_to(jnp.arange(n)[None], logits.shape[:2])
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = (ce * mask).sum() / denom
    acc = ((jnp.argmax(logits, -1) == targets) * mask).sum() / denom
    return loss, acc
