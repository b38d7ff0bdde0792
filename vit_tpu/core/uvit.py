"""U-ViT building blocks (reference blocks.py:124-201).

These are part of the Bytedance blocks inventory: ``DropPath`` stochastic depth
(blocks.py:124-152), the standalone ``Mlp`` (blocks.py:155-171) and ``UViTBlock`` —
a pre-LN block with an optional U-Net-style skip concatenation + linear merge and
gradient checkpointing (blocks.py:174-201; torch.utils.checkpoint ≙ jax.remat).
The reference defines them for TiTok-variant experimentation; none of its training
scripts instantiate UViTBlock directly, but the building block is part of the public
surface.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from vit_tpu.ops.gelu import gelu as gelu_op

from vit_tpu.ops.attention import fused_qkv_attention


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference blocks.py:124-152): with probability
    ``rate`` an entire residual branch is dropped for a sample; survivors are scaled
    by 1/keep_prob."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    """fc → act → drop → fc → drop (reference blocks.py:155-171)."""

    hidden_features: int
    out_features: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.hidden_features, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        h = gelu_op(h)  # default tanh_erf: exact-erf at bf16 resolution (ops/gelu.py)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.out_features, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class UViTBlock(nn.Module):
    """Pre-LN attention/MLP block with optional skip-cat merge + remat
    (reference blocks.py:174-201)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    dropout: float = 0.0
    drop_path: float = 0.0
    skip: bool = False
    use_checkpoint: bool = False          # jax.checkpoint ≙ torch.utils.checkpoint
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip: Optional[jax.Array] = None,
                 deterministic: bool = True):
        if self.skip:
            if skip is None:
                raise ValueError("skip=True requires a skip tensor")
            x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="skip_linear")(jnp.concatenate([x, skip], axis=-1))

        def body(module, x):
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=module.param_dtype, name="norm1")(x)
            qkv = nn.Dense(3 * module.dim, use_bias=module.qkv_bias,
                           dtype=module.dtype, param_dtype=module.param_dtype,
                           name="qkv")(h.astype(module.dtype))
            attn = fused_qkv_attention(qkv, module.num_heads)
            attn = nn.Dense(module.dim, dtype=module.dtype,
                            param_dtype=module.param_dtype, name="proj")(attn)
            x = x + DropPath(module.drop_path, name="drop_path1")(
                attn, deterministic)
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=module.param_dtype, name="norm2")(x)
            h = Mlp(int(module.dim * module.mlp_ratio), module.dim,
                    module.dropout, module.dtype, module.param_dtype,
                    name="mlp")(h.astype(module.dtype), deterministic)
            return x + DropPath(module.drop_path, name="drop_path2")(
                h, deterministic)

        if self.use_checkpoint:
            return nn.remat(body)(self, x)
        return body(self, x)
