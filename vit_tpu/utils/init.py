"""Parameter initializers matching PyTorch module defaults.

The reference relies on torch's default inits everywhere except the TATiTok /
LlamaGen-TiTok paths (trunc_normal std 0.02, reference train_tatitok.py:56-69,
train_llamagen_titok.py:108-121) and the "enhancing" variant (Xavier uniform,
reference train_enhancing_vitvqgan.py:90-101). Matching init distributions keeps
training behavior comparable even though exact values differ by PRNG.

Torch defaults being mirrored:
  - nn.Linear / nn.Conv2d: kaiming_uniform(a=√5) ≡ U(±1/√fan_in) for the weight,
    U(±1/√fan_in) for the bias.
  - nn.Embedding: N(0, 1).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(±1/√fan_in) for a Dense kernel of shape (fan_in, fan_out)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(±1/√fan_in) for a Conv kernel of shape (*window, in_ch, out_ch)."""
    fan_in = math.prod(shape[:-1])
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_embed_init(key, shape, dtype=jnp.float32):
    """N(0,1), torch nn.Embedding default."""
    return jax.random.normal(key, shape, dtype)


def trunc_normal_init(std: float = 0.02):
    """trunc_normal(mean 0, given std, clipped at ±2σ) — torch.nn.init.trunc_normal_."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std

    return init


def scaled_normal_init(scale: float):
    """N(0, scale²) — the Bytedance `scale * randn` parameter init (blocks.py:241-247)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * scale

    return init


def dense(features: int, fan_in: int, *, use_bias: bool = True,
          dtype=None, param_dtype=jnp.float32, name=None) -> nn.Dense:
    """nn.Dense with torch nn.Linear default initialization."""
    return nn.Dense(
        features=features,
        use_bias=use_bias,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(fan_in),
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )
