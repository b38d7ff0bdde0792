"""Enhancing ViT-VQGAN and LlamaGen-TiTok: golden pos-embeds, shapes, training."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.models.enhancing_vqgan import (EnhancingViTVQGAN,
                                            EnhancingVQGANConfig,
                                            sincos_2d_pos_embed)
from vit_tpu.models.llamagen_titok import LlamaGenTiTok, LlamaGenTiTokConfig


def test_sincos_pos_embed_golden():
    """Golden vs the reference's numpy construction
    (train_enhancing_vitvqgan.py:40-87)."""
    d, g = 8, 2
    got = sincos_2d_pos_embed(d, g)
    assert got.shape == (g * g, d)

    def ref_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=float)
        omega /= dim / 2.0
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_w, grid_h = np.meshgrid(np.arange(g, dtype=float),
                                 np.arange(g, dtype=float))
    want = np.concatenate([ref_1d(d // 2, grid_h), ref_1d(d // 2, grid_w)], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def tiny_enhancing_config():
    cfg = EnhancingVQGANConfig(image_size=16, patch_size=4, codebook_size=32,
                               latent_dim=6, dtype=jnp.float32, attn_impl="xla")
    cfg.dim, cfg.depth, cfg.heads, cfg.dim_head, cfg.mlp_dim = 32, 2, 2, 16, 64
    return cfg


def test_enhancing_shapes_and_roundtrip():
    cfg = tiny_enhancing_config()
    model = EnhancingViTVQGAN(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    recon, indices, loss = model.apply({"params": params}, x)
    assert recon.shape == (2, 16, 16, 3)
    assert indices.shape == (2, cfg.n_patches)
    idx = model.apply({"params": params}, x, method="encode")
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(indices))
    recon2 = model.apply({"params": params}, idx, method="decode_indices")
    np.testing.assert_allclose(np.asarray(recon2), np.asarray(recon), atol=1e-5)


def test_enhancing_get_last_layer():
    cfg = tiny_enhancing_config()
    model = EnhancingViTVQGAN(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    w = params["decoder"]["to_pixel"]["kernel"]
    assert w.shape == (cfg.dim, cfg.patch_size ** 2 * 3)


def tiny_llamagen_config():
    cfg = LlamaGenTiTokConfig(vq_codebook_size=64, vq_latent_tokens=16,
                              latent_tokens=8, codebook_size=32, latent_dim=6,
                              transformer="S", dtype=jnp.float32, attn_impl="xla")
    cfg.trans_config = cfg.trans_config.replace(n_layers=2, n_heads=2, n_embd=32)
    cfg.n_embd = 32
    return cfg


def test_llamagen_titok_shapes():
    cfg = tiny_llamagen_config()
    model = LlamaGenTiTok(cfg)
    codes = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, 64)
    params = model.init(jax.random.PRNGKey(1), codes)["params"]
    logits, indices, loss = model.apply({"params": params}, codes)
    assert logits.shape == (2, 16, 64)
    assert indices.shape == (2, 8)
    assert np.asarray(indices).max() < cfg.codebook_size


def test_llamagen_ce_training_decreases_loss():
    import optax

    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState

    cfg = tiny_llamagen_config()
    model = LlamaGenTiTok(cfg)
    codes = jax.random.randint(jax.random.PRNGKey(0), (4, 16), 0, 64)
    params = model.init(jax.random.PRNGKey(1), codes)["params"]
    tx = make_optimizer(3e-3, 1, 1000, 3e-4, 1e-4, clip_norm=1.0)
    state = TrainState.create(params, tx)

    @jax.jit
    def step(state, codes):
        def loss_fn(p):
            logits, _, q = model.apply({"params": p}, codes)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, 64), codes.reshape(-1)).mean()
            return ce + q, ce

        (loss, ce), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), ce

    first = None
    for _ in range(40):
        state, ce = step(state, codes)
        if first is None:
            first = float(ce)
    assert float(ce) < first


def test_multisteps_accumulation_matches_big_batch():
    """The fixed grad-accumulation semantics (SURVEY.md §2d bug 3): optax.MultiSteps
    over 2 micro-batches must equal one step on the concatenated batch."""
    import optax

    w0 = jnp.asarray([1.0, -2.0])
    xs = jnp.asarray([[1.0, 2.0], [3.0, -1.0], [0.5, 0.5], [-1.0, 2.0]])
    ys = jnp.asarray([1.0, -1.0, 0.5, 2.0])

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    tx_full = optax.sgd(0.1)
    s_full = tx_full.init(w0)
    g_full = jax.grad(loss)(w0, xs, ys)
    up, _ = tx_full.update(g_full, s_full, w0)
    w_full = optax.apply_updates(w0, up)

    tx_ms = optax.MultiSteps(optax.sgd(0.1), every_k_schedule=2)
    s_ms = tx_ms.init(w0)
    w = w0
    for i in range(2):
        g = jax.grad(loss)(w0, xs[2 * i:2 * i + 2], ys[2 * i:2 * i + 2])
        up, s_ms = tx_ms.update(g, s_ms, w)
        w = optax.apply_updates(w, up)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_full), rtol=1e-6)
