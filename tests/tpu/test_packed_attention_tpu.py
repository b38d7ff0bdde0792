"""TPU-only: compiled packed-attention paths at flagship shapes.

The CPU suite covers these in interpret mode; this exercises the Mosaic-compiled
kernels on the real chip: the stage-batched bb=2 path (B even, Sp ≤ 384), the
biased variant with its VMEM bias gradient, the bb=1 odd-batch fallback, and the
q-block-tiled dropout stream (S=640 > one q block).

    JAX_PLATFORMS='' python -m pytest tests/tpu -q -p no:cacheprovider
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if jax.default_backend() != "tpu":  # pragma: no cover
    pytest.skip("requires a real TPU", allow_module_level=True)

from vit_tpu.kernels.attention import flash_attention_packed
from vit_tpu.ops.attention import attention_xla

H, D = 12, 64
NE = H * D


def _ref(qkv, causal=False):
    b, s, td = qkv.shape
    q, k, v = (qkv.astype(jnp.float32).reshape(b, s, 3, H, D)
               .transpose(2, 0, 3, 1, 4))
    out = attention_xla(q, k, v, causal=causal)
    return out.transpose(0, 2, 1, 3).reshape(b, s, NE)


@pytest.mark.parametrize("b,s", [(8, 320), (3, 320), (2, 640)])
def test_packed_fwd_grad_compiled(b, s):
    """bb=2 (b=8), odd-batch bb=1 (b=3), and beyond-bb sequence (s=640)."""
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, s, 3 * NE),
                            jnp.float32).astype(jnp.bfloat16)
    out = jax.jit(lambda x: flash_attention_packed(x, H))(qkv)
    ref = _ref(qkv)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) / scale < 0.03

    g = jax.jit(jax.grad(lambda x: jnp.sum(
        flash_attention_packed(x, H).astype(jnp.float32) ** 2)))(qkv)
    gr = jax.grad(lambda x: jnp.sum(_ref(x) ** 2))(qkv)
    gscale = float(jnp.max(jnp.abs(gr))) + 1e-6
    assert float(jnp.max(jnp.abs(g.astype(jnp.float32) - gr))) / gscale < 0.05


def test_packed_biased_bias_grad_compiled():
    """The VMEM-emitted qkv bias gradient vs explicit-add autodiff, compiled."""
    qkv_nb = jax.random.normal(jax.random.PRNGKey(1), (8, 320, 3 * NE),
                               jnp.float32).astype(jnp.bfloat16)
    bias = (jax.random.normal(jax.random.PRNGKey(2), (3 * NE,)) * 0.2)

    def loss_kernel(b_):
        return jnp.sum(flash_attention_packed(
            qkv_nb, H, qkv_bias=b_).astype(jnp.float32) ** 2)

    def loss_ref(b_):
        return jnp.sum(flash_attention_packed(
            qkv_nb + b_.astype(qkv_nb.dtype), H).astype(jnp.float32) ** 2)

    gb = jax.jit(jax.grad(loss_kernel))(bias)
    gr = jax.jit(jax.grad(loss_ref))(bias)
    scale = float(jnp.max(jnp.abs(gr))) + 1e-6
    assert float(jnp.max(jnp.abs(gb - gr))) / scale < 0.03


def test_packed_dropout_blocked_stream_compiled():
    """S=640: q-block-tiled fwd + full-seq bwd must share one mask stream —
    deterministic across calls and finite gradients, compiled."""
    rng = jax.random.PRNGKey(3)
    qkv = jax.random.normal(rng, (2, 640, 3 * NE), jnp.bfloat16)
    f = jax.jit(lambda x: flash_attention_packed(
        x, H, dropout_rate=0.15, dropout_rng=rng))
    o1, o2 = f(qkv), f(qkv)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    g = jax.jit(jax.grad(lambda x: jnp.sum(flash_attention_packed(
        x, H, dropout_rate=0.15,
        dropout_rng=rng).astype(jnp.float32) ** 2)))(qkv)
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))
