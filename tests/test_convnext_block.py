"""Parity tests for the fused ConvNeXt block-tail kernel (interpret mode on CPU).

Oracle = the unfused flax path of ConvNeXtBlock (mlp_impl="xla"), the same math the
torch golden test (tests/test_perceptual_golden.py) validates against torchvision's
ConvNeXt-S block (reference perceptual_loss.py:41).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.kernels.convnext_block import (
    _erf, frozen_convnext_block_tail, fused_supported)
from vit_tpu.losses.perceptual import ConvNeXtBlock


def _init_block(c, dtype, mlp_impl, seed=0):
    block = ConvNeXtBlock(c, dtype=dtype, mlp_impl=mlp_impl)
    x = jax.random.normal(jax.random.PRNGKey(seed), (2, 7, 7, c), jnp.float32)
    params = block.init(jax.random.PRNGKey(1), x)["params"]
    return block, params, x


def test_erf_approximation_accuracy():
    z = jnp.linspace(-30.0, 30.0, 40001)
    err = jnp.max(jnp.abs(_erf(z) - jax.lax.erf(z)))
    # round 5: tanh-composed quintic (ops/gelu.py fit) replaced the A&S
    # rational form — divide+exp serialized the VPU behind the MXU. Max
    # error 3.7e-5: 35x inside the 1e-3 golden contract, below bf16
    # activation resolution; the clamp keeps the far tails saturated.
    assert float(err) < 5e-5, float(err)


def test_fused_supported_gate():
    assert fused_supported(96, 384)
    assert fused_supported(384, 1536)
    assert not fused_supported(768, 3072)   # stage 3: over the VMEM budget
    assert not fused_supported(96, 400)     # non-4x expansion


@pytest.mark.parametrize("c", [96, 384])
def test_param_tree_identical_across_impls(c):
    _, p_fused, _ = _init_block(c, jnp.float32, "fused")
    _, p_xla, _ = _init_block(c, jnp.float32, "xla")
    flat_f = jax.tree_util.tree_leaves_with_path(p_fused)
    flat_x = jax.tree_util.tree_leaves_with_path(p_xla)
    paths_f = [(jax.tree_util.keystr(k), v.shape, v.dtype) for k, v in flat_f]
    paths_x = [(jax.tree_util.keystr(k), v.shape, v.dtype) for k, v in flat_x]
    assert paths_f == paths_x


@pytest.mark.parametrize("c,tol", [(96, 2e-5), (384, 2e-5)])
def test_forward_parity_fp32(c, tol):
    block, params, x = _init_block(c, jnp.float32, "xla")
    fused = ConvNeXtBlock(c, dtype=jnp.float32, mlp_impl="fused")
    ref = block.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    err = float(jnp.max(jnp.abs(got - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-8
    assert err / scale < tol, (err, scale)


def test_forward_parity_bf16():
    c = 96
    block, params, x = _init_block(c, jnp.bfloat16, "xla")
    fused = ConvNeXtBlock(c, dtype=jnp.bfloat16, mlp_impl="fused")
    ref = block.apply({"params": params}, x).astype(jnp.float32)
    got = fused.apply({"params": params}, x).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-8
    assert err / scale < 0.03, (err, scale)


@pytest.mark.parametrize("c", [96, 384])
def test_input_gradient_parity(c):
    """dx through the fused kernel (the only gradient the frozen perceptual loss
    needs) matches the unfused oracle."""
    block, params, x = _init_block(c, jnp.float32, "xla")
    fused = ConvNeXtBlock(c, dtype=jnp.float32, mlp_impl="fused")

    def loss(module):
        return lambda xx: jnp.sum(jnp.sin(
            module.apply({"params": params}, xx).astype(jnp.float32)))

    g_ref = jax.grad(loss(block))(x)
    g_fused = jax.grad(loss(fused))(x)
    err = float(jnp.max(jnp.abs(g_fused - g_ref)))
    scale = float(jnp.max(jnp.abs(g_ref))) + 1e-8
    assert err / scale < 5e-4, (err, scale)


def test_frozen_weight_contract_zero_param_grads():
    """Documented contract: parameter cotangents through the fused op are zero."""
    c = 96
    n = 24
    key = jax.random.PRNGKey(3)
    h = jax.random.normal(key, (n, c), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 1), (n, c), jnp.float32)
    lns = jnp.ones((c,))
    lnb = jnp.zeros((c,))
    w1 = jax.random.normal(jax.random.fold_in(key, 2), (c, 4 * c)) * 0.02
    b1 = jnp.zeros((4 * c,))
    w2 = jax.random.normal(jax.random.fold_in(key, 3), (4 * c, c)) * 0.02
    b2 = jnp.zeros((c,))
    gamma = jnp.full((c,), 0.5)

    def f(w1_, gamma_):
        y = frozen_convnext_block_tail(h, x, lns, lnb, w1_, b1, w2, b2, gamma_)
        return jnp.sum(y)

    dw1, dgamma = jax.grad(f, argnums=(0, 1))(w1, gamma)
    assert float(jnp.max(jnp.abs(dw1))) == 0.0
    assert float(jnp.max(jnp.abs(dgamma))) == 0.0


def test_row_padding_odd_n():
    """N not a multiple of the row tile (and < sublane) pads and slices cleanly."""
    c = 96
    for n in (3, 13, 520):
        key = jax.random.PRNGKey(n)
        h = jax.random.normal(key, (n, c), jnp.float32)
        x = jnp.zeros((n, c), jnp.float32)
        lns, lnb = jnp.ones((c,)), jnp.zeros((c,))
        w1 = jnp.eye(c, 4 * c) * 0.1
        b1, b2 = jnp.zeros((4 * c,)), jnp.zeros((c,))
        w2 = jnp.eye(4 * c, c) * 0.1
        gamma = jnp.ones((c,))
        y = frozen_convnext_block_tail(h, x, lns, lnb, w1, b1, w2, b2, gamma)
        assert y.shape == (n, c)
        assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.parametrize("c", [96, 256])
def test_int8_forward_close_to_fp(c):
    """quant="int8" (--perceptual_quant): both pwconv GEMMs int8 — output
    tracks the fp oracle within the symmetric-127-level error model
    (~1% relative RMS per matmul, core/quant.py docstring)."""
    block, params, x = _init_block(c, jnp.float32, "xla")
    q8 = ConvNeXtBlock(c, dtype=jnp.float32, mlp_impl="fused", quant="int8")
    ref = block.apply({"params": params}, x)
    got = q8.apply({"params": params}, x)
    rel = float(jnp.linalg.norm(got - ref) / (jnp.linalg.norm(ref) + 1e-8))
    assert rel < 0.05, rel
    # and it is NOT bit-identical (the int8 path is actually engaged)
    assert float(jnp.max(jnp.abs(got - ref))) > 0.0


def test_int8_input_gradient_close_and_frozen(c=96):
    """The straight-through int8 backward tracks the fp dx and upholds the
    frozen-weight contract (zero parameter cotangents)."""
    block, params, x = _init_block(c, jnp.float32, "xla")
    q8 = ConvNeXtBlock(c, dtype=jnp.float32, mlp_impl="fused", quant="int8")

    def loss(m):
        return lambda xx: jnp.sum(m.apply({"params": params}, xx) ** 2)

    g_ref = jax.grad(loss(block))(x)
    g_q8 = jax.grad(loss(q8))(x)
    rel = float(jnp.linalg.norm(g_q8 - g_ref) /
                (jnp.linalg.norm(g_ref) + 1e-8))
    assert rel < 0.1, rel

    gp = jax.grad(lambda p: jnp.sum(
        q8.apply({"params": p}, x)))(params)
    # dwconv params DO get gradients (outside the fused tail); tail params not
    for name in ("norm", "pwconv1", "pwconv2", "gamma"):
        sub = gp[name] if name in gp else None
        leaves = jax.tree_util.tree_leaves(sub)
        assert all(float(jnp.max(jnp.abs(l))) == 0.0 for l in leaves), name


def test_frozen_int8_dense_numerics():
    """XLA int8 path for the stage-3 (C=768) unfused blocks."""
    from vit_tpu.core.quant import frozen_int8_dense

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    y = frozen_int8_dense(x, w, b)
    ref = x @ w + b
    assert float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref)) < 0.03
    gx = jax.grad(lambda x: jnp.sum(frozen_int8_dense(x, w, b) ** 2))(x)
    gref = jax.grad(lambda x: jnp.sum((x @ w + b) ** 2))(x)
    assert float(jnp.linalg.norm(gx - gref) / jnp.linalg.norm(gref)) < 0.05
    gw, gb = jax.grad(lambda w, b: jnp.sum(frozen_int8_dense(x, w, b)),
                      argnums=(0, 1))(w, b)
    assert float(jnp.max(jnp.abs(gw))) == 0.0
    assert float(jnp.max(jnp.abs(gb))) == 0.0


def test_perceptual_loss_int8_smoke():
    """PerceptualLoss(quant="int8") end-to-end: finite, close to fp, grads flow
    to the images (stage-3 XLA int8 + fused int8 tails in one graph)."""
    from vit_tpu.losses.perceptual import ConvNeXt, PerceptualLoss

    params = PerceptualLoss.init_params()
    fp = PerceptualLoss(params, mlp_impl="xla")
    q8 = PerceptualLoss(params, mlp_impl="fused", quant="int8")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    ref = float(fp(x, y))
    got = float(q8(x, y))
    assert np.isfinite(got)
    assert abs(got - ref) / (abs(ref) + 1e-8) < 0.2, (got, ref)
    g = jax.grad(lambda x: q8(x, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0
