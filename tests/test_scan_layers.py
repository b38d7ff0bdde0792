"""scan_layers: the transformer stack compiled as ONE lax.scan over stacked
layer params (vit_tpu/core/transformer.py). The XLA program shrinks
~n_layers-fold — the compile-time lever for the 10-minute flagship compiles
through this environment's TPU tunnel — with identical math.

Pins: forward parity vs the unrolled stack given converted params;
grads match at fp32 tolerance (scan reassociates the accumulation); the
KV-cache decode path works scanned (cache gains the leading layer axis); the
stacked tree shards correctly under dp×fsdp×tp and a sharded step matches the
single-device step; layout converters round-trip and cross the
pretrain→fine-tune hand-off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vit_tpu.core.config import TransformerConfig
from vit_tpu.core.transformer import (Transformer, convert_stack_layout,
                                      stack_layer_params, unstack_layer_params)


def _cfg(**kw):
    base = dict(n_layers=3, n_heads=4, n_embd=32, block_size=16,
                dtype=jnp.float32)
    base.update(kw)
    return TransformerConfig(**base)


def _init_pair(cfg, x):
    """(unrolled params, stacked params-from-conversion)."""
    p_un = Transformer(cfg).init(jax.random.PRNGKey(0), x)["params"]
    return p_un, stack_layer_params(p_un, cfg.n_layers)


def test_forward_parity():
    cfg = _cfg()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    p_un, p_st = _init_pair(cfg, x)
    y_un = Transformer(cfg).apply({"params": p_un}, x)
    y_st = Transformer(cfg.replace(scan_layers=True)).apply({"params": p_st}, x)
    # same math; XLA may reassociate across the scan boundary (~1e-7 fp32)
    np.testing.assert_allclose(np.asarray(y_un), np.asarray(y_st),
                               rtol=1e-5, atol=1e-6)


def test_grad_parity():
    cfg = _cfg()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    p_un, p_st = _init_pair(cfg, x)
    g_un = jax.grad(lambda p: Transformer(cfg).apply({"params": p}, x).sum())(p_un)
    g_st = jax.grad(lambda p: Transformer(cfg.replace(scan_layers=True))
                    .apply({"params": p}, x).sum())(p_st)
    for a, b in zip(jax.tree_util.tree_leaves(g_un),
                    jax.tree_util.tree_leaves(unstack_layer_params(g_st))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_remat_composes():
    cfg = _cfg(remat=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    p_un, p_st = _init_pair(cfg, x)
    g_un = jax.grad(lambda p: Transformer(cfg).apply({"params": p}, x).sum())(p_un)
    g_st = jax.grad(lambda p: Transformer(cfg.replace(scan_layers=True))
                    .apply({"params": p}, x).sum())(p_st)
    for a, b in zip(jax.tree_util.tree_leaves(g_un),
                    jax.tree_util.tree_leaves(unstack_layer_params(g_st))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("policy", ["dots", "dots_no_batch"])
def test_remat_policy_grad_parity(policy):
    """remat_policy changes WHAT the backward recomputes, never the grads:
    scanned+remat(policy) grads must match the unrolled no-remat stack."""
    cfg = _cfg()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    p_un, p_st = _init_pair(cfg, x)
    g_un = jax.grad(lambda p: Transformer(cfg).apply({"params": p}, x).sum())(p_un)
    rcfg = cfg.replace(scan_layers=True, remat=True, remat_policy=policy)
    g_st = jax.grad(
        lambda p: Transformer(rcfg).apply({"params": p}, x).sum())(p_st)
    for a, b in zip(jax.tree_util.tree_leaves(g_un),
                    jax.tree_util.tree_leaves(unstack_layer_params(g_st))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_remat_policy_rejects_unknown():
    cfg = _cfg(remat=True, remat_policy="bogus", scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    with pytest.raises(ValueError, match="remat_policy"):
        Transformer(cfg).init(jax.random.PRNGKey(0), x)


def test_layout_roundtrip_and_convert():
    cfg = _cfg()
    x = jnp.zeros((1, 16, 32))
    p_un, p_st = _init_pair(cfg, x)
    rt = unstack_layer_params(p_st)
    for a, b in zip(jax.tree_util.tree_leaves(p_un),
                    jax.tree_util.tree_leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # convert_stack_layout: idempotent in both directions
    assert convert_stack_layout(p_st, True) is p_st
    assert convert_stack_layout(p_un, False) is p_un
    assert "layers" in convert_stack_layout(p_un, True)
    assert "layer_0" in convert_stack_layout(p_st, False)


def test_kv_cache_decode_scanned():
    """Prefill + one-by-one decode under scan matches the full causal forward
    (the VideoGPT rollout path, models/videogpt.py)."""
    cfg = _cfg(causal=True, block_size=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))
    p_un, p_st = _init_pair(cfg, x)
    full = Transformer(cfg).apply({"params": p_un}, x)

    m = Transformer(cfg.replace(scan_layers=True))
    out, vars_ = m.apply({"params": p_st}, x[:, :4], True, 0, mutable=["cache"])
    cache = vars_["cache"]
    # cache is stacked along the layer axis
    assert cache["layers"]["attn"]["k"].shape[0] == cfg.n_layers
    outs = [out]
    for t in range(4, 8):
        o, vars_ = m.apply({"params": p_st, "cache": cache}, x[:, t:t + 1],
                           True, t, mutable=["cache"])
        cache = vars_["cache"]
        outs.append(o)
    dec = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_pretrain_handoff_crosses_layouts():
    """An unrolled MAE pretrain initializes a --scan_layers fine-tune (and the
    reverse): load_encoder_into_vit normalizes the transformer subtree."""
    from vit_tpu.models.mae import MAE, MAEConfig, load_encoder_into_vit
    from vit_tpu.models.vit import ViTClassifier, ViTConfig

    mae_cfg = MAEConfig(image_size=16, patch_size=4, transformer="S",
                        decoder_layers=1, decoder_heads=4, decoder_embd=32,
                        dtype=jnp.float32)
    mae_cfg.enc_config = mae_cfg.enc_config.replace(n_layers=2, n_heads=4,
                                                    n_embd=32)
    images = jnp.zeros((1, 16, 16, 3))
    mae_params = MAE(mae_cfg).init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        images)["params"]

    vit_cfg = ViTConfig(16, 3, 4, "S", 1, 0.0, dtype=jnp.float32,
                        scan_layers=True)
    vit_cfg.trans_config = vit_cfg.trans_config.replace(n_layers=2, n_heads=4,
                                                        n_embd=32)
    vit_params = ViTClassifier(vit_cfg, num_classes=4).init(
        jax.random.PRNGKey(2), images)["params"]
    out = load_encoder_into_vit(mae_params, vit_params)
    got = out["vit"]["transformer"]["layers"]["attn"]["qkv"]["kernel"]
    want = np.stack([np.asarray(
        mae_params["encoder"]["transformer"][f"layer_{i}"]["attn"]["qkv"]["kernel"])
        for i in range(2)])
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_scanned_stack_shards_and_matches_single_device():
    """Stacked params shard with a replicated layer axis (parallel/sharding.py)
    and a dp×fsdp×tp sharded TiTok step with scan_layers matches the
    single-device step."""
    from vit_tpu.models.titok import TiTok, TiTokConfig
    from vit_tpu.parallel.mesh import batch_sharding, make_mesh
    from vit_tpu.parallel.sharding import state_shardings
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState
    from vit_tpu.train.step import make_tokenizer_train_step

    cfg = TiTokConfig(image_size=16, patch_size=4, latent_tokens=8,
                      codebook_size=32, latent_dim=6, transformer="S",
                      dtype=jnp.float32, attn_impl="xla", scan_layers=True)
    for name in ("enc_vit_config", "dec_vit_config"):
        sub = getattr(cfg, name)
        sub.trans_config = sub.trans_config.replace(n_layers=2, n_heads=4,
                                                    n_embd=32)
    cfg.n_embd = 32
    model = TiTok(cfg)
    images = jax.random.uniform(jax.random.PRNGKey(0), (8, 16, 16, 3))
    usage = jnp.zeros((cfg.codebook_size,), jnp.float32)
    rng = jax.random.PRNGKey(7)
    step_fn = make_tokenizer_train_step(model)

    def make_state():
        params = model.init(jax.random.PRNGKey(1), images)["params"]
        tx = make_optimizer(1e-3, 2, 100, 1e-4, 1e-4, clip_norm=1.0)
        return TrainState.create(params, tx)

    s1, u1, m1, _ = jax.jit(step_fn)(make_state(), images, usage, rng)

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    state = make_state()
    st_sh = state_shardings(mesh, state)
    qkv_sh = st_sh.params["enc"]["vit"]["transformer"]["layers"]["attn"]["qkv"]
    assert qkv_sh["kernel"].spec == P(None, "fsdp", "model")
    assert qkv_sh["bias"].spec == P(None, "model")
    b_sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    state = jax.device_put(state, st_sh)
    sharded = jax.jit(step_fn, in_shardings=(st_sh, b_sh, rep, rep),
                      out_shardings=(st_sh, rep, rep, b_sh))
    with mesh:
        s2, u2, m2, _ = sharded(state, jax.device_put(images, b_sh),
                                jax.device_put(usage, rep), rng)
    np.testing.assert_allclose(float(m1["train/loss"]),
                               float(m2["train/loss"]), rtol=2e-5)
    # stacked kernel physically sharded: (2, 32, 96) -> (2, 16, 48) shards
    k = s2.params["enc"]["vit"]["transformer"]["layers"]["attn"]["qkv"]["kernel"]
    assert {s.data.shape for s in k.addressable_shards} == {(2, 16, 48)}
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_config_threading_all_families():
    """Every shared-Transformer model config threads scan_layers through to its
    TransformerConfig(s). (EnhancingVQGAN is the documented exception: its flat
    per-layer UViT naming predates the stacked layout.)"""
    from vit_tpu.models.llamagen_titok import LlamaGenTiTokConfig
    from vit_tpu.models.mae import MAEConfig
    from vit_tpu.models.puzzle import PuzzleConfig
    from vit_tpu.models.tatitok import TATiTokConfig
    from vit_tpu.models.titok import TiTokConfig
    from vit_tpu.models.videogpt import VideoGPTConfig
    from vit_tpu.models.vit import ViTConfig
    from vit_tpu.models.vit_vqgan import ViTVQGANConfig

    assert ViTConfig(32, 3, 4, "S", 0, 0.0,
                     scan_layers=True).trans_config.scan_layers
    t = TiTokConfig(32, 4, 8, 32, 6, "S", scan_layers=True)
    assert t.enc_vit_config.trans_config.scan_layers
    assert t.dec_vit_config.trans_config.scan_layers
    v = ViTVQGANConfig(32, 4, 32, 6, "S", scan_layers=True)
    assert v.enc_vit_config.trans_config.scan_layers
    assert v.dec_vit_config.trans_config.scan_layers
    assert VideoGPTConfig(16, 32, "S", 4,
                          scan_layers=True).trans_config.scan_layers
    assert TATiTokConfig(32, 4, 8, 32, 6, "small",
                         scan_layers=True).trans_config.scan_layers
    assert LlamaGenTiTokConfig(32, 8, 8, 32, 6, "S",
                               scan_layers=True).trans_config.scan_layers
    m = MAEConfig(32, 3, 4, "S", scan_layers=True)
    assert m.enc_config.scan_layers and m.dec_config.scan_layers
    assert PuzzleConfig(32, 3, 4, "S",
                        scan_layers=True).trans_config.scan_layers
