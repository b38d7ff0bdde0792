"""TiTok tokenizer: shapes, encode/decode roundtrip, train step, perceptual loss."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.models.titok import TiTok, TiTokConfig


def tiny_titok_config(**kw):
    defaults = dict(image_size=16, patch_size=4, latent_tokens=8, codebook_size=32,
                    latent_dim=6, transformer="S", dtype=jnp.float32, attn_impl="xla")
    defaults.update(kw)
    cfg = TiTokConfig(**defaults)
    for name in ("enc_vit_config", "dec_vit_config"):
        sub = getattr(cfg, name)
        sub.trans_config = sub.trans_config.replace(n_layers=2, n_heads=2, n_embd=32)
    cfg.n_embd = 32
    return cfg


def test_titok_shapes():
    cfg = tiny_titok_config()
    model = TiTok(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    recon, indices, loss = model.apply({"params": params}, x)
    assert recon.shape == (2, 16, 16, 3)
    assert indices.shape == (2, cfg.latent_tokens)
    assert np.asarray(indices).max() < cfg.codebook_size
    assert loss.shape == ()


def test_encode_decode_indices_roundtrip():
    """decode_indices(encode(x)) must equal the forward recon: the STE output is
    numerically the raw codebook vector (reference train_titok.py:58, 86-88)."""
    cfg = tiny_titok_config()
    model = TiTok(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    recon, indices, _ = model.apply({"params": params}, x)
    idx = model.apply({"params": params}, x, method="encode")
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(indices))
    recon2 = model.apply({"params": params}, idx, method="decode_indices")
    np.testing.assert_allclose(np.asarray(recon2), np.asarray(recon), atol=1e-5)


def test_titok_fsq_variant():
    cfg = tiny_titok_config(quantizer="fsq", latent_dim=4, fsq_levels=(8, 5, 5, 5))
    model = TiTok(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    recon, indices, loss = model.apply({"params": params}, x)
    assert recon.shape == (2, 16, 16, 3)
    assert float(loss) == 0.0


def test_tokenizer_train_step_decreases_recon():
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState
    from vit_tpu.train.step import make_tokenizer_train_step

    cfg = tiny_titok_config()
    model = TiTok(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    tx = make_optimizer(3e-3, 1, 1000, 3e-4, 1e-4, clip_norm=1.0)
    state = TrainState.create(params, tx)
    step = jax.jit(make_tokenizer_train_step(model))
    usage = jnp.zeros((cfg.codebook_size,))
    rng = jax.random.PRNGKey(2)

    first = None
    for _ in range(40):
        state, usage, metrics, _ = step(state, x, usage, rng)
        if first is None:
            first = float(metrics["train/recon_loss"])
    last = float(metrics["train/recon_loss"])
    assert last < first, (first, last)
    assert 0.0 < float(metrics["train/codebook_usage"]) <= 1.0


def test_perceptual_loss_zero_for_identical_and_positive_otherwise():
    from vit_tpu.losses.perceptual import ConvNeXt, PerceptualLoss

    # tiny ConvNeXt to keep CPU time sane; same code path as ConvNeXt-S
    loss = PerceptualLoss.__new__(PerceptualLoss)
    loss.model = ConvNeXt(depths=(1, 1), dims=(8, 16), num_classes=10)
    loss.params = loss.model.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 224, 224, 3)))["params"]
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    assert float(loss(x, x)) == 0.0
    assert float(loss(x, y)) > 0.0


def test_matmul_resize_matches_jax_image_resize():
    from vit_tpu.losses.resize import resize_bilinear_antialias

    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (2, 48, 64, 3))
    got = resize_bilinear_antialias(img, 32, 32)
    want = jax.image.resize(img, (2, 32, 32, 3), "bilinear", antialias=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
