"""Full-model golden parity for the two model families round 1 left untested:
enhancing-ViT-VQGAN (sincos pos-emb, Tanh FFN, affine LNs, ConvTranspose-as-matmul
head — reference train_enhancing_vitvqgan.py:40-272) and LlamaGen-TiTok (token-space
TiTok over frozen VQ codes — reference train_llamagen_titok.py:20-116).

Pattern follows tests/test_golden_titok.py: ONE set of Flax weights, the reference
math re-expressed in torch, outputs compared at 1e-3.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from einops import rearrange

TOL = 1e-3


def _t(a):
    return torch.from_numpy(np.asarray(a))


def torch_core_transformer(tp, t, n_embd, n_heads, n_layers):
    """Author's minimal core (reference transformer.py:31-54): pre-LN (no affine),
    fused-qkv SDPA (no out-proj), exact-GELU MLP."""
    for i in range(n_layers):
        lp = tp[f"layer_{i}"]
        h = F.layer_norm(t, (n_embd,))
        qkv = h @ _t(lp["attn"]["qkv"]["kernel"]) + _t(lp["attn"]["qkv"]["bias"])
        b, n, _ = qkv.shape
        qkv = qkv.view(b, n, 3, n_heads, n_embd // n_heads).permute(2, 0, 3, 1, 4)
        attn = F.scaled_dot_product_attention(qkv[0], qkv[1], qkv[2])
        t = t + attn.permute(0, 2, 1, 3).reshape(b, n, n_embd)
        h = F.layer_norm(t, (n_embd,))
        h = F.gelu(h @ _t(lp["mlp"]["fc1"]["kernel"]) + _t(lp["mlp"]["fc1"]["bias"]))
        t = t + h @ _t(lp["mlp"]["fc2"]["kernel"]) + _t(lp["mlp"]["fc2"]["bias"])
    return t


def torch_minimal_vq(z, codebook):
    """Reference 15-line VQ (train_titok.py:45-59): normalized distance, argmin,
    UN-normalized lookup (the subtlety), STE value = looked-up vector."""
    zn = F.normalize(z, dim=-1, eps=1e-30)
    cn = F.normalize(codebook, dim=-1, eps=1e-30)
    d = torch.cdist(zn.reshape(-1, z.shape[-1]), cn)
    idx = d.argmin(-1)
    q = codebook[idx].reshape(z.shape)
    return q, idx.reshape(z.shape[:-1])


def test_llamagen_titok_golden():
    from vit_tpu.models.llamagen_titok import LlamaGenTiTok, LlamaGenTiTokConfig

    cfg = LlamaGenTiTokConfig(vq_codebook_size=64, vq_latent_tokens=16,
                              latent_tokens=8, codebook_size=32, latent_dim=6,
                              transformer="S", dtype=jnp.float32, attn_impl="xla")
    cfg.trans_config = cfg.trans_config.replace(n_layers=2, n_heads=2, n_embd=32)
    cfg.n_embd = 32
    model = LlamaGenTiTok(cfg)
    codes = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, 64)
    params = model.init(jax.random.PRNGKey(1), codes)["params"]
    logits, indices, _ = model.apply({"params": params}, codes)

    # --- torch forward with the same weights ---
    ep = params["enc"]
    xt = _t(codes).long()
    inp = _t(ep["tok_emb"])[xt] + _t(ep["pos_emb"])[None, :16]
    extra = _t(ep["extra_emb"])[None].expand(2, -1, -1)
    t = torch.cat([extra, inp], dim=1)
    t = torch_core_transformer(ep["transformer"], t, 32, 2, 2)
    latent = t[:, :8] @ _t(ep["proj"]["kernel"]) + _t(ep["proj"]["bias"])

    q, ref_idx = torch_minimal_vq(latent, _t(params["quant"]["codebook"]))
    np.testing.assert_array_equal(np.asarray(indices), ref_idx.numpy())

    dp = params["dec"]
    z_emb = (q @ _t(dp["quant_proj"]["kernel"]) + _t(dp["quant_proj"]["bias"])
             + _t(dp["pos_emb"])[None, :8])
    mask = _t(dp["mask_tokens"])[None].expand(2, -1, -1)
    t = torch.cat([mask, z_emb], dim=1)
    t = torch_core_transformer(dp["transformer"], t, 32, 2, 2)
    ref_logits = (t[:, :16] @ _t(dp["emb_proj"]["kernel"])
                  + _t(dp["emb_proj"]["bias"]))
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               atol=TOL, rtol=TOL)


def _torch_sincos(embed_dim, grid_size):
    """Independent re-derivation of the reference's 2-D sincos embedding
    (train_enhancing_vitvqgan.py:40-87): rows then cols, [sin, cos] per axis."""
    def axis(pos):
        dim = embed_dim // 2
        omega = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2))
        out = np.outer(pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gw, gh = np.meshgrid(np.arange(grid_size, dtype=np.float32),
                         np.arange(grid_size, dtype=np.float32))
    return torch.from_numpy(
        np.concatenate([axis(gh), axis(gw)], axis=1).astype(np.float32))


def _torch_enhancing_transformer(tp, t, cfg):
    """Reference :104-169: affine pre-LNs, bias-free fused qkv + out-proj,
    Tanh FFN, trailing LayerNorm."""
    inner = cfg.dim_head * cfg.heads
    for i in range(cfg.depth):
        lp_n = tp[f"attn_norm_{i}"]
        h = F.layer_norm(t, (cfg.dim,), _t(lp_n["scale"]), _t(lp_n["bias"]))
        qkv = h @ _t(tp[f"attn_{i}"]["to_qkv"]["kernel"])
        b, n, _ = qkv.shape
        qkv = qkv.view(b, n, 3, cfg.heads, cfg.dim_head).permute(2, 0, 3, 1, 4)
        a = F.scaled_dot_product_attention(qkv[0], qkv[1], qkv[2])
        a = a.permute(0, 2, 1, 3).reshape(b, n, inner)
        a = a @ _t(tp[f"attn_{i}"]["to_out"]["kernel"]) \
            + _t(tp[f"attn_{i}"]["to_out"]["bias"])
        t = t + a
        fp_n = tp[f"ff_norm_{i}"]
        h = F.layer_norm(t, (cfg.dim,), _t(fp_n["scale"]), _t(fp_n["bias"]))
        h = torch.tanh(h @ _t(tp[f"ff1_{i}"]["kernel"]) + _t(tp[f"ff1_{i}"]["bias"]))
        h = h @ _t(tp[f"ff2_{i}"]["kernel"]) + _t(tp[f"ff2_{i}"]["bias"])
        t = t + h
    fn = tp["final_norm"]
    return F.layer_norm(t, (cfg.dim,), _t(fn["scale"]), _t(fn["bias"]))


def test_enhancing_vqgan_golden():
    from vit_tpu.models.enhancing_vqgan import (EnhancingVQGANConfig,
                                                EnhancingViTVQGAN)

    cfg = EnhancingVQGANConfig(image_size=16, patch_size=4, codebook_size=32,
                               latent_dim=6, dim=32, depth=2, heads=2,
                               dim_head=16, mlp_dim=64, dtype=jnp.float32,
                               attn_impl="xla")
    model = EnhancingViTVQGAN(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    recon, indices, _ = model.apply({"params": params}, x)

    # --- torch forward ---
    p = cfg.patch_size
    xt = _t(rearrange(np.asarray(x), "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p, p2=p))
    ep = params["encoder"]
    t = xt @ _t(ep["patch_embed"]["kernel"]) + _t(ep["patch_embed"]["bias"])
    pos = _torch_sincos(cfg.dim, cfg.grid_size)
    t = t + pos[None]
    t = _torch_enhancing_transformer(ep["transformer"], t, cfg)
    latent = t @ _t(params["pre_quant_proj"]["kernel"]) \
        + _t(params["pre_quant_proj"]["bias"])

    q, ref_idx = torch_minimal_vq(latent, _t(params["quant"]["codebook"]))
    np.testing.assert_array_equal(np.asarray(indices), ref_idx.numpy())

    z = q @ _t(params["quant_proj"]["kernel"]) + _t(params["quant_proj"]["bias"])
    dp = params["decoder"]
    t = z + pos[None]
    t = _torch_enhancing_transformer(dp["transformer"], t, cfg)
    img = t @ _t(dp["to_pixel"]["kernel"]) + _t(dp["to_pixel"]["bias"])
    ref = rearrange(img.numpy(), "b (h w) (p1 p2 c) -> b (h p1) (w p2) c",
                    h=cfg.grid_size, p1=p, p2=p)
    np.testing.assert_allclose(np.asarray(recon), ref, atol=TOL, rtol=TOL)
