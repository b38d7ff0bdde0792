"""Batch-innermost ("hwnc") ConvNeXt layout: exact parity with the default
NHWC path on the same parameters.

On TPU the perceptual net runs (H, W, B, C) activations (conv
dimension_numbers HWNC) so the convs' preferred layout is the default layout
and no boundary copies are inserted against the layout-pinning block-tail
custom-calls (losses/perceptual.py). Everything between convs is rowwise on C,
so the two layouts must be numerically identical — not just close."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.losses.perceptual import ConvNeXt, PerceptualLoss


SMALL = dict(depths=(1, 1, 2, 1), dims=(32, 64, 128, 256), num_classes=10)


def test_convnext_hwnc_matches_nhwc():
    model_n = ConvNeXt(**SMALL, layout="nhwc", mlp_impl="xla")
    model_h = ConvNeXt(**SMALL, layout="hwnc", mlp_impl="xla")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3), jnp.float32)
    params = model_n.init(jax.random.PRNGKey(1), x)["params"]
    # identical param tree: hwnc applies the same checkpoint unchanged
    out_n = model_n.apply({"params": params}, x)
    out_h = model_h.apply({"params": params}, jnp.transpose(x, (1, 2, 0, 3)))
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_h),
                               rtol=1e-5, atol=1e-5)


def test_perceptual_loss_hwnc_matches_nhwc_with_grad():
    params = PerceptualLoss.init_params()
    pl_n = PerceptualLoss(params, layout="nhwc")
    pl_h = PerceptualLoss(params, layout="hwnc")
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (2, 96, 96, 3), jnp.float32)
    y = jax.random.uniform(jax.random.PRNGKey(3), (2, 96, 96, 3), jnp.float32)

    v_n, g_n = jax.value_and_grad(lambda x: pl_n(x, y))(x)
    v_h, g_h = jax.value_and_grad(lambda x: pl_h(x, y))(x)
    np.testing.assert_allclose(float(v_n), float(v_h), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_n), np.asarray(g_h),
                               rtol=1e-4, atol=1e-6)


def test_auto_layout_is_nhwc():
    # hwnc measured perf-neutral on the flagship (copies eliminated, conv
    # emitter correspondingly slower) — auto resolves to the simpler nhwc.
    pl = PerceptualLoss(PerceptualLoss.init_params())
    assert pl.layout == "nhwc"
