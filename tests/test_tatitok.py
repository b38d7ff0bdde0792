"""TATiTok (Bytedance path): shapes, VQ semantics, clustering update, wd mask."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vit_tpu.models.tatitok import TATiTok, TATiTokConfig
from vit_tpu.quantize.bytedance_vq import BytedanceVectorQuantizer


def tiny_config(**kw):
    defaults = dict(image_size=16, patch_size=4, latent_tokens=8, codebook_size=32,
                    latent_dim=6, transformer="small", dtype=jnp.float32,
                    attn_impl="xla")
    defaults.update(kw)
    cfg = TATiTokConfig(**defaults)
    cfg.width = 32
    cfg.trans_config = cfg.trans_config.replace(n_layers=2, n_heads=2, n_embd=32)
    return cfg


def test_tatitok_shapes_and_result_dict():
    cfg = tiny_config()
    model = TATiTok(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    recon, result = model.apply({"params": params}, x)
    assert recon.shape == (2, 16, 16, 3)
    assert set(result) >= {"quantizer_loss", "commitment_loss", "codebook_loss",
                           "min_encoding_indices"}
    assert result["min_encoding_indices"].shape == (2, cfg.latent_tokens)


def test_tatitok_decode_tokens_roundtrip():
    cfg = tiny_config()
    model = TATiTok(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    recon, result = model.apply({"params": params}, x)
    recon2 = model.apply({"params": params}, result["min_encoding_indices"],
                         method="decode_tokens")
    np.testing.assert_allclose(np.asarray(recon2), np.asarray(recon), atol=1e-5)


def test_text_guided_decoder():
    cfg = tiny_config(text_guidance=True, text_context_length=5, text_embed_dim=12)
    model = TATiTok(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    tg = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 12))
    params = model.init(jax.random.PRNGKey(1), x, tg)["params"]
    recon, _ = model.apply({"params": params}, x, tg)
    assert recon.shape == (2, 16, 16, 3)
    tg2 = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 12))
    recon2, _ = model.apply({"params": params}, x, tg2)
    assert not np.allclose(np.asarray(recon), np.asarray(recon2))


def test_bytedance_vq_l2_semantics_vs_torch():
    """use_l2_norm path: normalized z AND normalized lookup (blocks.py:440-452)."""
    vq = BytedanceVectorQuantizer(codebook_size=16, token_size=4, use_l2_norm=True)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4))
    params = vq.init(jax.random.PRNGKey(1), z)["params"]
    quantized, result = vq.apply({"params": params}, z)

    # torch-side reference math (expanded-square distance, normalized both sides)
    zt = torch.from_numpy(np.asarray(z)).reshape(-1, 4)
    et = torch.from_numpy(np.asarray(params["embedding"]))
    ztn = torch.nn.functional.normalize(zt, dim=-1)
    etn = torch.nn.functional.normalize(et, dim=-1)
    d = (ztn.pow(2).sum(1, keepdim=True) + etn.pow(2).sum(1)
         - 2 * ztn @ etn.T)
    idx = d.argmin(1)
    np.testing.assert_array_equal(
        np.asarray(result["min_encoding_indices"]).reshape(-1), idx.numpy())
    want_q = etn[idx].numpy()
    np.testing.assert_allclose(np.asarray(quantized).reshape(-1, 4), want_q,
                               atol=1e-5)
    want_commit = 0.25 * ((want_q - ztn.numpy()) ** 2).mean()
    np.testing.assert_allclose(float(result["commitment_loss"]), want_commit,
                               rtol=1e-5)


def test_clustering_vq_reseeds_dead_codes():
    vq = BytedanceVectorQuantizer(codebook_size=8, token_size=4, use_l2_norm=False,
                                  clustering_vq=True)
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 4)) * 5.0
    variables = vq.init(jax.random.PRNGKey(1), z, True)
    params, stats = variables["params"], variables["vq_stats"]
    (_, result), new_vars = vq.apply(
        {"params": params, "vq_stats": stats}, z, True, mutable=["vq_stats"])
    assert "new_embedding" in result
    new_emb = np.asarray(result["new_embedding"])
    old_emb = np.asarray(params["embedding"])
    # codes move toward data (init is tiny uniform; data has std 5)
    assert np.abs(new_emb).mean() > np.abs(old_emb).mean()
    assert np.any(np.asarray(new_vars["vq_stats"]["embed_prob"]) > 0)


def test_wd_exclude_mask_on_tatitok_params():
    """make_optim exclusions (reference train_tatitok.py:95-111)."""
    from vit_tpu.train.optim import wd_exclude_mask

    cfg = tiny_config()
    model = TATiTok(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    mask = wd_exclude_mask(params)
    # latent token bank, embeddings, norms, biases excluded from decay
    assert mask["latent_tokens"] is False
    assert mask["quantize"]["embedding"] is False
    assert mask["encoder"]["patch_embed"]["bias"] is False
    assert mask["encoder"]["ln_pre"]["scale"] is False
    # big kernels decay
    assert mask["encoder"]["transformer"]["layer_0"]["attn"]["qkv"]["kernel"] is True
