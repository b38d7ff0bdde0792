"""Full-model golden parity: vit_tpu TiTok forward vs the reference math re-expressed
in torch, sharing one set of weights (BASELINE.json north star: reconstruction parity
at 1e-3).

The torch side re-implements the reference semantics end-to-end — ViT patch-embed conv
+ learned pos-emb + prepended latent slots (train_vit.py:30-45), pre-LN transformer
with SDPA (transformer.py:16-54), encoder latent slice + projection
(train_titok.py:34-43), L2-norm VQ with unnormalized lookup and STE
(train_titok.py:45-59), decoder latents-as-image + mask-slot outputs + 1×1 projection
+ depth-to-space (train_titok.py:61-77) — parameterized by the Flax weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vit_tpu.models.titok import TiTok, TiTokConfig

TOL = 1e-3


def torch_vit_forward(vp, x_nchw, cfg_vit, n_embd, n_heads, n_layers):
    """Reference ViT forward (train_vit.py:38-45) with Flax params vp."""
    p = cfg_vit.patch_size
    w = np.asarray(vp["patch_proj"]["proj"]["kernel"])          # (p·p·c, d)
    c = x_nchw.shape[1]
    w_conv = torch.from_numpy(
        w.reshape(p, p, c, n_embd).transpose(3, 2, 0, 1).copy())
    b_conv = torch.from_numpy(np.asarray(vp["patch_proj"]["proj"]["bias"]))
    patch = F.conv2d(x_nchw, w_conv, b_conv, stride=p)           # (B, d, h, w)
    patch = patch.flatten(2).transpose(1, 2)                     # b (h w) d
    patch = patch + torch.from_numpy(np.asarray(vp["pos_emb"]))
    if "extra_emb" in vp:
        extra = torch.from_numpy(np.asarray(vp["extra_emb"])).expand(
            x_nchw.shape[0], -1, -1)
        t = torch.cat([extra, patch], dim=1)
    else:
        t = patch
    # pre-LN transformer (transformer.py:31-54), no-affine LN, fused qkv, no out-proj
    for i in range(n_layers):
        lp = vp["transformer"][f"layer_{i}"]
        h = F.layer_norm(t, (n_embd,))
        qkv = h @ torch.from_numpy(np.asarray(lp["attn"]["qkv"]["kernel"])) \
            + torch.from_numpy(np.asarray(lp["attn"]["qkv"]["bias"]))
        b, n, _ = qkv.shape
        qkv = qkv.view(b, n, 3, n_heads, n_embd // n_heads).permute(2, 0, 3, 1, 4)
        attn = F.scaled_dot_product_attention(qkv[0], qkv[1], qkv[2])
        t = t + attn.permute(0, 2, 1, 3).reshape(b, n, n_embd)
        h = F.layer_norm(t, (n_embd,))
        h = F.gelu(h @ torch.from_numpy(np.asarray(lp["mlp"]["fc1"]["kernel"]))
                   + torch.from_numpy(np.asarray(lp["mlp"]["fc1"]["bias"])))
        t = t + (h @ torch.from_numpy(np.asarray(lp["mlp"]["fc2"]["kernel"]))
                 + torch.from_numpy(np.asarray(lp["mlp"]["fc2"]["bias"])))
    return t


def test_titok_full_forward_golden():
    cfg = TiTokConfig(image_size=16, patch_size=4, latent_tokens=8, codebook_size=32,
                      latent_dim=6, transformer="S", dtype=jnp.float32,
                      attn_impl="xla")
    for name in ("enc_vit_config", "dec_vit_config"):
        sub = getattr(cfg, name)
        sub.trans_config = sub.trans_config.replace(n_layers=2, n_heads=2, n_embd=32)
    cfg.n_embd = 32
    model = TiTok(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    recon, indices, qloss = model.apply({"params": params}, x)

    # ---- torch reference forward with the same weights ----
    xt = torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)).copy())

    # encoder: ViT over image, keep first K outputs, project (train_titok.py:40-43)
    enc_out = torch_vit_forward(params["enc"]["vit"], xt, cfg.enc_vit_config,
                                32, 2, 2)
    lat = enc_out[:, :cfg.latent_tokens]
    lat = lat @ torch.from_numpy(np.asarray(params["enc"]["proj"]["kernel"])) \
        + torch.from_numpy(np.asarray(params["enc"]["proj"]["bias"]))

    # quantizer (train_titok.py:50-59)
    zn = F.normalize(lat, dim=-1)
    cb = torch.from_numpy(np.asarray(params["quant"]["codebook"]))
    idx = torch.cdist(zn, F.normalize(cb, dim=-1)).argmin(dim=-1)
    quantized = cb[idx]                                  # unnormalized lookup
    codebook_loss = (quantized - zn).pow(2).mean()
    commitment = 0.25 * (quantized - zn).pow(2).mean()
    want_qloss = float(codebook_loss + commitment)

    # decoder (train_titok.py:69-77): quant_proj → (b, d, K, 1) image → ViT →
    # first n_patches outputs → 1×1 proj → depth-to-space
    z = quantized @ torch.from_numpy(
        np.asarray(params["dec"]["quant_proj"]["kernel"])) \
        + torch.from_numpy(np.asarray(params["dec"]["quant_proj"]["bias"]))
    z_img = z.transpose(1, 2).unsqueeze(-1)              # b d K 1 (NCHW)
    dec_out = torch_vit_forward(params["dec"]["vit"], z_img, cfg.dec_vit_config,
                                32, 2, 2)
    dec_out = dec_out[:, :cfg.n_patches]
    img = dec_out @ torch.from_numpy(
        np.asarray(params["dec"]["embd_proj"]["kernel"])) \
        + torch.from_numpy(np.asarray(params["dec"]["embd_proj"]["bias"]))
    # (b, hw, p1·p2·c) → depth-to-space, feature order (p1 p2 c)
    g, p = cfg.grid_size, cfg.patch_size
    img = img.view(2, g, g, p, p, 3).permute(0, 1, 3, 2, 4, 5).reshape(
        2, g * p, g * p, 3)

    np.testing.assert_array_equal(np.asarray(indices), idx.numpy())
    np.testing.assert_allclose(float(qloss), want_qloss, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(recon), img.numpy(), atol=TOL, rtol=TOL)


def test_vit_classifier_golden():
    """ViT classifier (reference train_vit.py:47-53): Linear head on token 0 of the
    full ViT forward — end-to-end parity with the torch reference math."""
    from vit_tpu.models.vit import ViTClassifier, ViTConfig

    cfg = ViTConfig(16, 3, 4, "S", 2, 0.0, dtype=jnp.float32, attn_impl="xla")
    cfg.trans_config = cfg.trans_config.replace(n_layers=2, n_heads=2, n_embd=32)
    model = ViTClassifier(cfg, num_classes=5)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    logits = model.apply({"params": params}, x)

    xt = torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)).copy())
    tokens = torch_vit_forward(params["vit"], xt, cfg, 32, 2, 2)
    want = tokens[:, 0] @ torch.from_numpy(
        np.asarray(params["head"]["kernel"])) \
        + torch.from_numpy(np.asarray(params["head"]["bias"]))
    np.testing.assert_allclose(np.asarray(logits), want.numpy(), atol=TOL, rtol=TOL)


def test_videogpt_forward_golden():
    """VideoGPT forward (reference train_videogpt.py:46-55): SOS-shifted token+pos
    embeddings → causal transformer → projection → next-token CE."""
    from vit_tpu.models.videogpt import VideoGPT, VideoGPTConfig

    cfg = VideoGPTConfig(4, 16, "S", max_frames=3, dropout=0.0,
                         dtype=jnp.float32, attn_impl="xla")
    cfg.trans_config = cfg.trans_config.replace(n_layers=2, n_heads=2, n_embd=32)
    cfg.n_embd = 32
    model = VideoGPT(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (2, 3, 4), 0, 16)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    logits, loss = model.apply({"params": params}, x)

    y = torch.from_numpy(np.asarray(x)).reshape(2, -1).long()
    sos = torch.full((2, 1), 16, dtype=torch.long)
    inp = torch.cat([sos, y[:, :-1]], dim=-1)
    t = torch.from_numpy(np.asarray(params["tok_embed"]))[inp] \
        + torch.from_numpy(np.asarray(params["pos_embed"]))[:12]
    n_embd, n_heads = 32, 2
    for i in range(2):
        lp = params["transformer"][f"layer_{i}"]
        h = F.layer_norm(t, (n_embd,))
        qkv = h @ torch.from_numpy(np.asarray(lp["attn"]["qkv"]["kernel"])) \
            + torch.from_numpy(np.asarray(lp["attn"]["qkv"]["bias"]))
        b, n, _ = qkv.shape
        qkv = qkv.view(b, n, 3, n_heads, n_embd // n_heads).permute(2, 0, 3, 1, 4)
        attn = F.scaled_dot_product_attention(qkv[0], qkv[1], qkv[2], is_causal=True)
        t = t + attn.permute(0, 2, 1, 3).reshape(b, n, n_embd)
        h = F.layer_norm(t, (n_embd,))
        h = F.gelu(h @ torch.from_numpy(np.asarray(lp["mlp"]["fc1"]["kernel"]))
                   + torch.from_numpy(np.asarray(lp["mlp"]["fc1"]["bias"])))
        t = t + (h @ torch.from_numpy(np.asarray(lp["mlp"]["fc2"]["kernel"]))
                 + torch.from_numpy(np.asarray(lp["mlp"]["fc2"]["bias"])))
    want_logits = t @ torch.from_numpy(np.asarray(params["proj"]["kernel"])) \
        + torch.from_numpy(np.asarray(params["proj"]["bias"]))
    want_loss = F.cross_entropy(want_logits.reshape(-1, 16), y.reshape(-1))

    np.testing.assert_allclose(np.asarray(logits), want_logits.numpy(),
                               atol=TOL, rtol=TOL)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-4)
