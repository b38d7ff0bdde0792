"""scan_layers for the "enhancing" ViT-VQGAN stack (models/enhancing_vqgan.py).

The enhancing transformer historically used flat per-layer param naming
(``attn_norm_0, attn_0, ff_norm_0, ff1_0, ff2_0, ...`` — that layout stays the
default for checkpoint compatibility). ``scan_layers`` compiles the same math
as ONE lax.scan over a stacked ``layers/...`` subtree, closing the last
entry point missing the compile-time lever (core stacks: test_scan_layers.py).

Pins: flat↔stacked converter round-trip; forward parity of the full model
across layouts; the stacked tree gets Megatron column/row specs with the layer
axis replicated; the flat layout's suffixed names (``ff1_0``) hit the same
column/row rules as their scanned (``ff1``) counterparts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vit_tpu.models.enhancing_vqgan import (
    EnhancingTransformer, EnhancingViTVQGAN, EnhancingVQGANConfig,
    convert_enhancing_layout, stack_enhancing_params, unstack_enhancing_params)


def _cfg(**kw):
    base = dict(image_size=16, patch_size=4, codebook_size=32, latent_dim=6,
                dim=32, depth=3, heads=4, dim_head=8, mlp_dim=64,
                dtype=jnp.float32)
    base.update(kw)
    return EnhancingVQGANConfig(**base)


def test_transformer_forward_parity():
    cfg = _cfg()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    p_flat = EnhancingTransformer(cfg).init(jax.random.PRNGKey(0), x)["params"]
    p_st = stack_enhancing_params(p_flat, cfg.depth)
    y_flat = EnhancingTransformer(cfg).apply({"params": p_flat}, x)
    y_st = EnhancingTransformer(cfg.replace(scan_layers=True)).apply(
        {"params": p_st}, x)
    np.testing.assert_allclose(np.asarray(y_flat), np.asarray(y_st),
                               rtol=1e-5, atol=1e-6)


def test_grad_parity_with_remat():
    cfg = _cfg()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    p_flat = EnhancingTransformer(cfg).init(jax.random.PRNGKey(0), x)["params"]
    p_st = stack_enhancing_params(p_flat, cfg.depth)
    g_flat = jax.grad(lambda p: EnhancingTransformer(cfg).apply(
        {"params": p}, x).sum())(p_flat)
    scfg = cfg.replace(scan_layers=True, remat=True)
    g_st = jax.grad(lambda p: EnhancingTransformer(scfg).apply(
        {"params": p}, x).sum())(p_st)
    for a, b in zip(jax.tree_util.tree_leaves(g_flat),
                    jax.tree_util.tree_leaves(unstack_enhancing_params(g_st))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_layout_roundtrip_and_convert():
    cfg = _cfg()
    x = jnp.zeros((1, 16, 32))
    p_flat = EnhancingTransformer(cfg).init(jax.random.PRNGKey(0), x)["params"]
    p_st = stack_enhancing_params(p_flat, cfg.depth)
    rt = unstack_enhancing_params(p_st)
    assert jax.tree_util.tree_structure(rt) == jax.tree_util.tree_structure(p_flat)
    for a, b in zip(jax.tree_util.tree_leaves(p_flat),
                    jax.tree_util.tree_leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # non-layer siblings (final_norm) pass through unchanged
    assert "final_norm" in p_st and "final_norm" in rt
    # convert: idempotent in both directions
    assert convert_enhancing_layout(p_st, True) is p_st
    assert convert_enhancing_layout(p_flat, False) is p_flat
    assert "layers" in convert_enhancing_layout(p_flat, True)
    assert "attn_0" in convert_enhancing_layout(p_st, False)


def test_full_model_parity_and_init_scanned():
    """The composed model (encoder+quant+decoder) agrees across layouts, and a
    fresh scan_layers init produces the stacked tree directly."""
    cfg = _cfg()
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    p_flat = EnhancingViTVQGAN(cfg).init(jax.random.PRNGKey(2), images)["params"]
    p_st = jax.tree_util.tree_map_with_path(lambda _, x: x, p_flat)  # deep copy
    for side in ("encoder", "decoder"):
        p_st[side]["transformer"] = stack_enhancing_params(
            p_st[side]["transformer"], cfg.depth)
    r1, i1, q1 = EnhancingViTVQGAN(cfg).apply({"params": p_flat}, images)
    scfg = cfg.replace(scan_layers=True)
    r2, i2, q2 = EnhancingViTVQGAN(scfg).apply({"params": p_st}, images)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    p_fresh = EnhancingViTVQGAN(scfg).init(jax.random.PRNGKey(2),
                                           images)["params"]
    enc_t = p_fresh["encoder"]["transformer"]
    assert "layers" in enc_t and "attn_0" not in enc_t
    assert enc_t["layers"]["ff1"]["kernel"].shape[0] == cfg.depth


def test_sharding_specs_both_layouts():
    """ff1/ff2/to_qkv/to_out get Megatron column/row specs in the scanned
    layout (layer axis replicated) AND in the flat suffixed layout."""
    from vit_tpu.parallel.sharding import spec_for

    class Leaf:
        def __init__(self, ndim):
            self.ndim = ndim

    # scanned: leading layer axis replicated, then column/row
    assert spec_for("encoder/transformer/layers/ff1/kernel", Leaf(3)) == \
        P(None, "fsdp", "model")
    assert spec_for("encoder/transformer/layers/ff2/kernel", Leaf(3)) == \
        P(None, "model", "fsdp")
    assert spec_for("encoder/transformer/layers/attn/to_qkv/kernel", Leaf(3)) == \
        P(None, "fsdp", "model")
    assert spec_for("encoder/transformer/layers/attn/to_out/kernel", Leaf(3)) == \
        P(None, "model", "fsdp")
    assert spec_for("encoder/transformer/layers/ff1/bias", Leaf(2)) == \
        P(None, "model")
    # flat: numeric suffix strips to the same rules
    assert spec_for("encoder/transformer/ff1_0/kernel", Leaf(2)) == \
        P("fsdp", "model")
    assert spec_for("encoder/transformer/ff2_11/kernel", Leaf(2)) == \
        P("model", "fsdp")
    assert spec_for("encoder/transformer/attn_3/to_out/kernel", Leaf(2)) == \
        P("model", "fsdp")


def test_config_threading_and_flag():
    """--scan_layers threads through EnhancingVQGANConfig, and the train script
    exposes the flag (closing the documented 8-of-9 exception)."""
    assert _cfg(scan_layers=True).scan_layers
    import subprocess
    import sys
    out = subprocess.run([sys.executable, "train_enhancing_vitvqgan.py",
                          "--help"], capture_output=True, text=True, timeout=120)
    assert "--scan_layers" in out.stdout
