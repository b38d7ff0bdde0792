"""Golden parity: Flax TATiTok vs a torch twin built from REAL torch modules.

The reference's TATiTok is Bytedance blocks.py:208-505 with nn.MultiheadAttention
inside ResidualAttentionBlock (blocks.py:44,60) and its checkpoints come as
``pytorch_model.bin`` (test_import.py:18-29). This builds the same architecture in
raw torch — real nn.MultiheadAttention, nn.Conv2d patch embed, Conv 1×1 heads —
with state-dict keys named exactly like the Bytedance checkpoint, pushes ONE set
of random weights through ``convert_bytedance_state_dict``, and asserts the full
encode→VQ→decode forward agrees. This is the round-trip proof that loading a real
external checkpoint is a file swap, not a code risk.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from vit_tpu.models.pretrained import convert_bytedance_state_dict
from vit_tpu.models.tatitok import TATiTok, TATiTokConfig


class _Mlp(nn.Module):
    def __init__(self, w):
        super().__init__()
        self.c_fc = nn.Linear(w, 4 * w)
        self.c_proj = nn.Linear(4 * w, w)

    def forward(self, x):
        return self.c_proj(F.gelu(self.c_fc(x)))


class _Block(nn.Module):
    """Bytedance ResidualAttentionBlock (blocks.py:32-70) with real
    nn.MultiheadAttention — the in_proj packing the converter must match."""

    def __init__(self, w, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(w, eps=1e-5)
        self.attn = nn.MultiheadAttention(w, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(w, eps=1e-5)
        self.mlp = _Mlp(w)

    def forward(self, x):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class _Encoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        w, p = cfg.width, cfg.patch_size
        scale = w ** -0.5
        self.patch_embed = nn.Conv2d(3, w, p, stride=p)
        self.class_embedding = nn.Parameter(scale * torch.randn(w))
        self.positional_embedding = nn.Parameter(
            scale * torch.randn(cfg.grid_size ** 2 + 1, w))
        self.latent_token_positional_embedding = nn.Parameter(
            scale * torch.randn(cfg.latent_tokens, w))
        self.ln_pre = nn.LayerNorm(w, eps=1e-5)
        self.transformer = nn.ModuleList(
            [_Block(w, cfg.trans_config.n_heads)
             for _ in range(cfg.trans_config.n_layers)])
        self.ln_post = nn.LayerNorm(w, eps=1e-5)
        self.conv_out = nn.Conv2d(w, cfg.latent_dim, 1)
        self.grid2 = cfg.grid_size ** 2

    def forward(self, pixels_nchw, latent_tokens):
        b = pixels_nchw.shape[0]
        h = self.patch_embed(pixels_nchw).flatten(2).transpose(1, 2)  # (B,g²,W)
        cls = self.class_embedding[None, None].expand(b, 1, -1)
        x = torch.cat([cls, h], 1) + self.positional_embedding[None]
        lat = (latent_tokens[None].expand(b, -1, -1)
               + self.latent_token_positional_embedding[None])
        x = torch.cat([x, lat], 1)
        x = self.ln_pre(x)
        for blk in self.transformer:
            x = blk(x)
        lat_out = self.ln_post(x[:, 1 + self.grid2:])
        z = self.conv_out(lat_out.transpose(1, 2).unsqueeze(-1))
        return z.squeeze(-1).transpose(1, 2)  # (B, K, token_size)


class _Decoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        w, p = cfg.width, cfg.patch_size
        scale = w ** -0.5
        self.cfg = cfg
        self.decoder_embed = nn.Linear(cfg.latent_dim, w)
        self.class_embedding = nn.Parameter(scale * torch.randn(w))
        self.positional_embedding = nn.Parameter(
            scale * torch.randn(cfg.grid_size ** 2 + 1, w))
        self.mask_token = nn.Parameter(scale * torch.randn(1, 1, w))
        self.latent_token_positional_embedding = nn.Parameter(
            scale * torch.randn(cfg.latent_tokens, w))
        self.ln_pre = nn.LayerNorm(w, eps=1e-5)
        self.transformer = nn.ModuleList(
            [_Block(w, cfg.trans_config.n_heads)
             for _ in range(cfg.trans_config.n_layers)])
        self.ln_post = nn.LayerNorm(w, eps=1e-5)
        self.ffn = nn.Sequential(nn.Conv2d(w, p * p * 3, 1))
        self.conv_out = nn.Conv2d(3, 3, 3, padding=1)
        if cfg.text_guidance:
            self.text_guidance_proj = nn.Linear(cfg.text_embed_dim, w)
            self.text_guidance_positional_embedding = nn.Parameter(
                scale * torch.randn(cfg.text_context_length, w))

    def forward(self, zq, text_guidance=None):
        cfg = self.cfg
        b, k, _ = zq.shape
        g, p = cfg.grid_size, cfg.patch_size
        x = self.decoder_embed(zq)
        mask = self.mask_token.expand(b, g * g, -1)
        cls = self.class_embedding[None, None].expand(b, 1, -1)
        mask = torch.cat([cls, mask], 1) + self.positional_embedding[None]
        x = x + self.latent_token_positional_embedding[None, :k]
        x = torch.cat([mask, x], 1)
        if cfg.text_guidance:
            tg = (self.text_guidance_proj(text_guidance)
                  + self.text_guidance_positional_embedding[None])
            x = torch.cat([x, tg], 1)
        x = self.ln_pre(x)
        for blk in self.transformer:
            x = blk(x)
        x = self.ln_post(x[:, 1:1 + g * g])
        y = self.ffn(x.transpose(1, 2).reshape(b, -1, g, g))  # (B, p²·3, g, g)
        # depth-to-space: channel index = (p1, p2, c) — matches the Flax
        # rearrange "b (h w) (p1 p2 c) -> b (h p1) (w p2) c"
        y = y.reshape(b, p, p, 3, g, g).permute(0, 3, 4, 1, 5, 2)
        y = y.reshape(b, 3, g * p, g * p)
        return self.conv_out(y)


class _TorchTATiTok(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.encoder = _Encoder(cfg)
        self.decoder = _Decoder(cfg)
        self.latent_tokens = nn.Parameter(
            (cfg.width ** -0.5) * torch.randn(cfg.latent_tokens, cfg.width))

        class _Q(nn.Module):
            def __init__(self):
                super().__init__()
                self.embedding = nn.Embedding(cfg.codebook_size, cfg.latent_dim)

        self.quantize = _Q()

    def forward(self, pixels_nchw, text_guidance=None):
        z = self.encoder(pixels_nchw, self.latent_tokens)      # (B, K, ts)
        zf = z.reshape(-1, self.cfg.latent_dim)
        zn = F.normalize(zf, dim=-1)
        en = F.normalize(self.quantize.embedding.weight, dim=-1)
        d = ((zn ** 2).sum(1, keepdim=True) + (en ** 2).sum(1)[None]
             - 2 * zn @ en.T)
        idx = d.argmin(-1)
        q = F.normalize(self.quantize.embedding(idx), dim=-1)   # (BK, ts)
        zq = q.reshape(z.shape)
        recon = self.decoder(zq, text_guidance)
        return recon, idx.reshape(z.shape[:-1])


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith(("ln_1.weight", "ln_2.weight", "ln_pre.weight",
                              "ln_post.weight")):
                p.copy_(1.0 + 0.1 * torch.randn(p.shape, generator=g))
            else:
                p.copy_(0.02 * torch.randn(p.shape, generator=g))


def _small_cfg(**kw):
    return TATiTokConfig(image_size=32, patch_size=16, latent_tokens=8,
                         codebook_size=64, latent_dim=12, transformer="small",
                         use_l2_norm=True, dtype=jnp.float32, **kw)


def test_tatitok_golden_vs_torch():
    cfg = _small_cfg()
    twin = _TorchTATiTok(cfg).eval()
    _randomize(twin, 0)
    params = convert_bytedance_state_dict(twin.state_dict(), cfg)

    x = np.random.default_rng(1).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref, ref_idx = twin(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()

    model = TATiTok(cfg)
    got, result = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(result["min_encoding_indices"]),
                                  ref_idx.numpy())
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=1e-3)


def test_tatitok_golden_text_guidance():
    cfg = _small_cfg(text_guidance=True, text_context_length=5, text_embed_dim=16)
    twin = _TorchTATiTok(cfg).eval()
    _randomize(twin, 2)
    params = convert_bytedance_state_dict(twin.state_dict(), cfg)

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    tg = rng.normal(0, 1, (2, 5, 16)).astype(np.float32)
    with torch.no_grad():
        ref, _ = twin(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(tg))
    ref = ref.permute(0, 2, 3, 1).numpy()

    model = TATiTok(cfg)
    got, _ = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(tg))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=1e-3)


def test_bytedance_checkpoint_dir_loads_end_to_end(tmp_path):
    """The reference's on-disk format (test_import.py:18-29): config.yaml +
    checkpoint-*/unwrapped_model/pytorch_model.bin → get_titok_tokenizer →
    FrozenTokenizer round trip, indices matching the torch twin."""
    import yaml

    from vit_tpu.models.pretrained import FrozenTokenizer, get_titok_tokenizer

    cfg = _small_cfg()
    twin = _TorchTATiTok(cfg).eval()
    _randomize(twin, 4)

    (tmp_path / "checkpoint-25000" / "unwrapped_model").mkdir(parents=True)
    torch.save(twin.state_dict(),
               tmp_path / "checkpoint-25000" / "unwrapped_model" /
               "pytorch_model.bin")
    (tmp_path / "config.yaml").write_text(yaml.dump({
        "model": {"vq_model": {
            "vit_enc_patch_size": 16, "num_latent_tokens": 8,
            "codebook_size": 64, "token_size": 12,
            "vit_enc_model_size": "small", "use_l2_norm": True,
        }},
        "dataset": {"preprocessing": {"crop_size": 32}},
    }))

    model, params = get_titok_tokenizer(str(tmp_path))
    tok = FrozenTokenizer(model, params)
    assert tok.latent_tokens == 8 and tok.codebook_size == 64
    assert tok.image_size == 32

    x = np.random.default_rng(5).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    idx = np.asarray(tok.encode_indices(jnp.asarray(x)))
    with torch.no_grad():
        _, ref_idx = twin(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_array_equal(idx, ref_idx.numpy())
    img = tok.decode_indices(jnp.asarray(idx))
    assert img.shape == (2, 32, 32, 3)
