"""Fused LN→matmul kernel (kernels/ln_matmul.py): forward/gradient parity vs the
unfused reference math, model-level fused-vs-unfused equality, and pjit sharding
parity (batch sharded, Megatron column-split W)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vit_tpu.kernels.ln_matmul import fused_ln_matmul, supported

C, F = 128, 384


def _ref(x, w, b=None, gelu=False):
    """The exact unfused math from core/transformer.py: fp32 non-affine LN,
    cast to compute dtype, matmul (+ bias + exact-erf gelu)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
    z = jnp.dot(y, w, preferred_element_type=jnp.float32).astype(jnp.float32)
    if b is not None:
        z = z + b.astype(jnp.float32)
    if gelu:
        # same tanh-erf gelu semantics as the kernel (round 5) — the
        # approximation itself is pinned against jax.lax.erf in
        # tests/test_gelu.py; here the KERNEL is pinned against an
        # independent XLA evaluation of the same math at tight tolerance
        from vit_tpu.ops.gelu import gelu as gelu_op

        z = gelu_op(z, "tanh_erf")
    return z.astype(x.dtype)


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def test_supported():
    assert supported(768, 3 * 768)
    assert not supported(96, 384)


@pytest.mark.parametrize("bias,gelu", [(False, False), (True, False),
                                       (True, True)])
def test_fwd_parity_fp32(bias, gelu):
    x = _rand((2, 5, C), 0)  # N=10: exercises row padding
    w = _rand((C, F), 1) * 0.1
    b = _rand((F,), 2) if bias else None
    got = fused_ln_matmul(x, w, b, gelu=gelu)
    want = _ref(x, w, b, gelu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fwd_parity_bf16():
    x = _rand((2, 8, C), 0, jnp.bfloat16)
    w = (_rand((C, F), 1) * 0.1).astype(jnp.bfloat16)
    got = fused_ln_matmul(x, w)
    want = _ref(x, w)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("gelu", [False, True])
def test_grad_parity(gelu):
    x = _rand((2, 5, C), 0)
    w = _rand((C, F), 1) * 0.1
    b = _rand((F,), 2)
    t = _rand((2, 5, F), 3)

    def loss_fused(x, w, b):
        return jnp.sum((fused_ln_matmul(x, w, b, gelu=gelu) - t) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum((_ref(x, w, b, gelu) - t) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, e, name in zip(g_f, g_r, "xwb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-4, err_msg=f"d{name}")


def test_model_level_fused_matches_unfused():
    """A 2-layer Transformer with fused_ln on vs off: same params, same output,
    same input gradient (fp32, xla attention)."""
    from vit_tpu.core.config import TransformerConfig
    from vit_tpu.core.transformer import Transformer

    kw = dict(n_layers=2, n_heads=4, n_embd=C, block_size=16,
              dtype=jnp.float32, attn_impl="xla")
    m_fused = Transformer(TransformerConfig(fused_ln=True, **kw))
    m_plain = Transformer(TransformerConfig(fused_ln=False, **kw))
    x = _rand((2, 16, C), 0)
    params = m_plain.init(jax.random.PRNGKey(1), x)["params"]
    # identical param trees: fused path must init to the same structure
    params_f = m_fused.init(jax.random.PRNGKey(1), x)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_f))

    y_p = m_plain.apply({"params": params}, x)
    y_f = m_fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_p),
                               rtol=1e-4, atol=1e-4)

    def loss(m, p, x):
        return jnp.sum(m.apply({"params": p}, x) ** 2)

    gp = jax.grad(loss, argnums=2)(m_plain, params, x)
    gf = jax.grad(loss, argnums=2)(m_fused, params, x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gp),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_pjit_sharded_parity():
    """Batch over data×fsdp, W column-split over model: sharded fwd+grad match
    the single-device values, with the pallas custom calls still present."""
    from vit_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    x = _rand((8, 4, C), 0)
    w = _rand((C, F), 1) * 0.1
    b = _rand((F,), 2)

    def loss(x, w, b):
        return jnp.sum(fused_ln_matmul(x, w, b, gelu=True) ** 2)

    vg = jax.value_and_grad(loss, argnums=(0, 1, 2))
    ref = vg(x, w, b)

    xs = jax.device_put(x, NamedSharding(mesh, P(("data", "fsdp"), None, None)))
    ws = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    bs = jax.device_put(b, NamedSharding(mesh, P("model")))
    got = jax.jit(vg)(xs, ws, bs)
    for a, e in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-4)
