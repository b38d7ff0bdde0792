"""Bytedance checkpoint conversion: attention-block parity vs torch
nn.MultiheadAttention, and full fake-checkpoint conversion roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from vit_tpu.core.config import TransformerConfig
from vit_tpu.core.transformer import TransformerLayer
from vit_tpu.models.pretrained import convert_bytedance_state_dict
from vit_tpu.models.tatitok import TATiTok, TATiTokConfig


def test_converted_block_matches_torch_multihead_attention():
    """The ResidualAttentionBlock layout (blocks.py:32-70): pre-LN MHA + pre-LN MLP.
    Verifies the in_proj_weight → fused-qkv kernel mapping bit-for-bit."""
    torch.manual_seed(0)
    w, h = 32, 4
    ln1, ln2 = nn.LayerNorm(w), nn.LayerNorm(w)
    attn = nn.MultiheadAttention(w, h, batch_first=True)
    fc, proj = nn.Linear(w, 4 * w), nn.Linear(4 * w, w)
    for m in (ln1, ln2):
        nn.init.normal_(m.weight, 1.0, 0.1)
        nn.init.normal_(m.bias, 0.0, 0.1)

    x = torch.randn(2, 9, w)
    with torch.no_grad():
        hln = ln1(x)
        t = x + attn(hln, hln, hln, need_weights=False)[0]
        want = (t + proj(torch.nn.functional.gelu(fc(ln2(t))))).numpy()

    cfg = TransformerConfig(n_layers=1, n_heads=h, n_embd=w, block_size=9,
                            dtype=jnp.float32, ln_affine=True, attn_out_proj=True,
                            attn_impl="xla")
    params = {
        "ln1": {"scale": ln1.weight.detach().numpy(),
                "bias": ln1.bias.detach().numpy()},
        "ln2": {"scale": ln2.weight.detach().numpy(),
                "bias": ln2.bias.detach().numpy()},
        "attn": {"qkv": {"kernel": attn.in_proj_weight.detach().numpy().T,
                         "bias": attn.in_proj_bias.detach().numpy()},
                 "out_proj": {"kernel": attn.out_proj.weight.detach().numpy().T,
                              "bias": attn.out_proj.bias.detach().numpy()}},
        "mlp": {"fc1": {"kernel": fc.weight.detach().numpy().T,
                        "bias": fc.bias.detach().numpy()},
                "fc2": {"kernel": proj.weight.detach().numpy().T,
                        "bias": proj.bias.detach().numpy()}},
    }
    got = TransformerLayer(cfg).apply({"params": jax.tree.map(jnp.asarray, params)},
                                      jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def _fake_bytedance_sd(cfg: TATiTokConfig):
    """Random torch state dict with the Bytedance naming scheme (blocks.py)."""
    torch.manual_seed(1)
    w = cfg.width
    p = cfg.patch_size
    g2 = cfg.grid_size ** 2
    nl = cfg.trans_config.n_layers
    ts = cfg.latent_dim
    sd = {
        "latent_tokens": torch.randn(cfg.latent_tokens, w) * 0.02,
        "quantize.embedding.weight": torch.rand(cfg.codebook_size, ts) * 0.01,
        "encoder.patch_embed.weight": torch.randn(w, 3, p, p) * 0.02,
        "encoder.patch_embed.bias": torch.zeros(w),
        "encoder.class_embedding": torch.randn(1, w) * 0.02,
        "encoder.positional_embedding": torch.randn(g2 + 1, w) * 0.02,
        "encoder.latent_token_positional_embedding":
            torch.randn(cfg.latent_tokens, w) * 0.02,
        "encoder.ln_pre.weight": torch.ones(w), "encoder.ln_pre.bias": torch.zeros(w),
        "encoder.ln_post.weight": torch.ones(w),
        "encoder.ln_post.bias": torch.zeros(w),
        "encoder.conv_out.weight": torch.randn(ts, w, 1, 1) * 0.02,
        "encoder.conv_out.bias": torch.zeros(ts),
        "decoder.decoder_embed.weight": torch.randn(w, ts) * 0.02,
        "decoder.decoder_embed.bias": torch.zeros(w),
        "decoder.class_embedding": torch.randn(1, w) * 0.02,
        "decoder.positional_embedding": torch.randn(g2 + 1, w) * 0.02,
        "decoder.mask_token": torch.randn(1, 1, w) * 0.02,
        "decoder.latent_token_positional_embedding":
            torch.randn(cfg.latent_tokens, w) * 0.02,
        "decoder.ln_pre.weight": torch.ones(w), "decoder.ln_pre.bias": torch.zeros(w),
        "decoder.ln_post.weight": torch.ones(w),
        "decoder.ln_post.bias": torch.zeros(w),
        "decoder.ffn.0.weight": torch.randn(p * p * 3, w, 1, 1) * 0.02,
        "decoder.ffn.0.bias": torch.zeros(p * p * 3),
        "decoder.conv_out.weight": torch.randn(3, 3, 3, 3) * 0.02,
        "decoder.conv_out.bias": torch.zeros(3),
    }
    for side in ("encoder", "decoder"):
        for i in range(nl):
            b = f"{side}.transformer.{i}"
            sd[f"{b}.ln_1.weight"] = torch.ones(w)
            sd[f"{b}.ln_1.bias"] = torch.zeros(w)
            sd[f"{b}.ln_2.weight"] = torch.ones(w)
            sd[f"{b}.ln_2.bias"] = torch.zeros(w)
            sd[f"{b}.attn.in_proj_weight"] = torch.randn(3 * w, w) * 0.02
            sd[f"{b}.attn.in_proj_bias"] = torch.zeros(3 * w)
            sd[f"{b}.attn.out_proj.weight"] = torch.randn(w, w) * 0.02
            sd[f"{b}.attn.out_proj.bias"] = torch.zeros(w)
            sd[f"{b}.mlp.c_fc.weight"] = torch.randn(4 * w, w) * 0.02
            sd[f"{b}.mlp.c_fc.bias"] = torch.zeros(4 * w)
            sd[f"{b}.mlp.c_proj.weight"] = torch.randn(w, 4 * w) * 0.02
            sd[f"{b}.mlp.c_proj.bias"] = torch.zeros(w)
    return sd


def test_full_fake_checkpoint_conversion_runs():
    cfg = TATiTokConfig(image_size=16, patch_size=4, latent_tokens=8,
                        codebook_size=32, latent_dim=6, transformer="small",
                        dtype=jnp.float32, attn_impl="xla")
    cfg.width = 32
    cfg.trans_config = cfg.trans_config.replace(n_layers=2, n_heads=2, n_embd=32)
    sd = _fake_bytedance_sd(cfg)
    params = convert_bytedance_state_dict(sd, cfg)
    model = TATiTok(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    recon, result = model.apply({"params": params}, x)
    assert recon.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(recon)).all()
    # param tree matches what init would produce
    ref = model.init(jax.random.PRNGKey(0), x)["params"]
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    assert got_shapes == ref_shapes
