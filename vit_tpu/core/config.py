"""Transformer configuration and size presets.

Capability parity with the reference's ``TransformerConfig`` and ``transformer_configs``
(reference: transformer.py:5-14, 56-59) plus the Bytedance-size presets used by the
TATiTok path (reference: blocks.py:219-233). TPU-specific additions: compute/param
dtypes (bf16 on the MXU, fp32 params), attention implementation selection and a
rematerialization flag (``jax.checkpoint`` on transformer blocks, the TPU equivalent of
torch.utils.checkpoint at reference blocks.py:192).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Pre-LN transformer hyperparameters (reference: transformer.py:5-14)."""

    n_layers: int
    n_heads: int
    n_embd: int
    block_size: int
    causal: bool = False
    dropout: float = 0.0

    # --- TPU-native knobs (no reference equivalent) ---
    dtype: jnp.dtype = jnp.bfloat16          # compute dtype (MXU-friendly)
    param_dtype: jnp.dtype = jnp.float32     # parameter dtype
    attn_impl: Optional[str] = None          # None=auto, "pallas", "xla"
    fused_ln: Optional[bool] = None          # None=auto: fuse pre-LN into the
                                             # qkv/fc1 matmul read on TPU
                                             # (kernels/ln_matmul.py)
    fused_fc_grad: Optional[bool] = None     # None=auto: fused dW+db backward
                                             # for the MLP matmuls on TPU
                                             # (kernels/fc_grad.py)
    quant: Optional[str] = None              # None | "int8": serving-only
                                             # int8 MXU matmuls for the block
                                             # Dense sites (core/quant.py);
                                             # param tree changes to
                                             # {kernel_q, scale, bias}
    remat: bool = False                      # jax.checkpoint each block
    remat_policy: Optional[str] = None       # None="everything" (max memory
                                             # saving, full recompute) |
                                             # "dots": save matmul outputs,
                                             # recompute only elementwise/LN
                                             # work in the backward — costs
                                             # ~the matmul activations in HBM,
                                             # buys back most of remat's step
                                             # overhead (jax.checkpoint
                                             # policies; core/transformer.py
                                             # _remat_policy)
    scan_layers: bool = False                # compile the stack as ONE
                                             # lax.scan over stacked params:
                                             # ~n_layers-fold smaller XLA
                                             # program (compile time), same
                                             # math; param tree changes to
                                             # layers/... with a leading
                                             # n_layers axis (converters in
                                             # core/transformer.py)
    pp_stages: int = 0                       # >1: GPipe-style pipeline
                                             # parallelism over the stack —
                                             # params gain a leading (stages,
                                             # layers_per_stage) shape, sharded
                                             # over the mesh "pipe" axis; pure
                                             # GSPMD (nn.scan ticks × nn.vmap
                                             # stages; the stage shift lowers
                                             # to collective-permute). See
                                             # core/transformer.py.
    pp_microbatches: int = 0                 # pipeline microbatches M (0 with
                                             # pp_stages>1 = 2*stages); bubble
                                             # fraction = (S-1)/(M+S-1)
    gelu_impl: Optional[str] = None          # None → $VIT_TPU_GELU → "tanh_erf"
                                             # (fitted tanh-composed erf, max
                                             # gelu err 5.4e-5 — exact-erf
                                             # semantics at bf16 resolution,
                                             # +~9 ms/step on the flagship;
                                             # ops/gelu.py) | "erf" (jax.lax.
                                             # erf, strict-parity) | "tanh"
    # Author's minimal core uses F.layer_norm without learnable affine params
    # (reference: transformer.py:43-44); the Bytedance core uses nn.LayerNorm with
    # affine (reference: blocks.py:43). Both behaviors are config-selectable.
    ln_affine: bool = False
    # Author's minimal Attention has no output projection (reference:
    # transformer.py:21-29); Bytedance blocks do (blocks.py:93). Config-selectable.
    attn_out_proj: bool = False

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_heads

    def replace(self, **kw) -> "TransformerConfig":
        return dataclasses.replace(self, **kw)


def S(**kwargs) -> TransformerConfig:
    """Small preset: 6L/8H/512 (reference: transformer.py:56)."""
    return TransformerConfig(n_layers=6, n_heads=8, n_embd=512, **kwargs)


def B(**kwargs) -> TransformerConfig:
    """Base preset: 12L/12H/768 (reference: transformer.py:57)."""
    return TransformerConfig(n_layers=12, n_heads=12, n_embd=768, **kwargs)


def L(**kwargs) -> TransformerConfig:
    """Large preset: 24L/16H/1024 (reference: transformer.py:58)."""
    return TransformerConfig(n_layers=24, n_heads=16, n_embd=1024, **kwargs)


transformer_configs = {"S": S, "B": B, "L": L}

# Bytedance TiTok presets (reference: blocks.py:219-233): width/layers/heads.
BYTEDANCE_WIDTH = {"small": 512, "base": 768, "large": 1024}
BYTEDANCE_LAYERS = {"small": 8, "base": 12, "large": 24}
BYTEDANCE_HEADS = {"small": 8, "base": 12, "large": 16}


def bytedance_config(model_size: str, block_size: int, **kwargs) -> TransformerConfig:
    """Transformer config for the Bytedance TiTok presets (blocks.py:219-233)."""
    return TransformerConfig(
        n_layers=BYTEDANCE_LAYERS[model_size],
        n_heads=BYTEDANCE_HEADS[model_size],
        n_embd=BYTEDANCE_WIDTH[model_size],
        block_size=block_size,
        ln_affine=True,
        attn_out_proj=True,
        **kwargs,
    )
