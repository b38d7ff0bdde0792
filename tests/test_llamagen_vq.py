"""Golden parity: Flax LlamaGen-VQGAN port vs a torch twin with LlamaGen keys.

The reference freezes an external LlamaGen ``VQ_models`` checkpoint
(reference train_llamagen_titok.py:140-155, ``{"model": state_dict}`` .pt).
We build the same taming-style CNN VQGAN in raw torch with LlamaGen's state-dict
naming (encoder.conv_blocks.{i}.res/attn/downsample..., mid ModuleList,
quantize.embedding), save it in the {"model": sd} format, load through
``load_llamagen_vq`` (which infers ch/ch_mult/res/attn/z/codebook from shapes),
and assert encode indices + decoded images agree.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from vit_tpu.models.llamagen_vq import load_llamagen_vq


class TRes(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class TAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = nn.GroupNorm(32, c, eps=1e-6)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.norm(x)
        q = self.q(h).reshape(b, c, hh * ww).permute(0, 2, 1)
        k = self.k(h).reshape(b, c, hh * ww)
        v = self.v(h).reshape(b, c, hh * ww)
        w = torch.bmm(q, k) * (c ** -0.5)
        w = torch.softmax(w, dim=2)
        h = torch.bmm(v, w.permute(0, 2, 1)).reshape(b, c, hh, ww)
        return x + self.proj_out(h)


class TDown(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TUp(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


def _level(cin, cout, n_res, n_attn, down=None, up=None):
    m = nn.Module()
    m.res = nn.ModuleList([TRes(cin if j == 0 else cout, cout)
                           for j in range(n_res)])
    m.attn = nn.ModuleList([TAttn(cout) for _ in range(n_attn)])
    if down:
        m.downsample = TDown(cout)
    if up:
        m.upsample = TUp(cout)
    return m


class TorchVQModel(nn.Module):
    """ch=32, ch_mult=(1,2), num_res_blocks=1, attn at the 64-ch level."""

    def __init__(self, n_embed=64, embed_dim=8):
        super().__init__()
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, 32, 3, padding=1)
        enc.conv_blocks = nn.ModuleList([
            _level(32, 32, 1, 0, down=True),
            _level(32, 64, 1, 1),
        ])
        enc.mid = nn.ModuleList([TRes(64, 64), TAttn(64), TRes(64, 64)])
        enc.norm_out = nn.GroupNorm(32, 64, eps=1e-6)
        enc.conv_out = nn.Conv2d(64, 16, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(16, 64, 3, padding=1)
        dec.mid = nn.ModuleList([TRes(64, 64), TAttn(64), TRes(64, 64)])
        dec.conv_blocks = nn.ModuleList([
            _level(64, 64, 2, 2, up=True),
            _level(64, 32, 2, 0),
        ])
        dec.norm_out = nn.GroupNorm(32, 32, eps=1e-6)
        dec.conv_out = nn.Conv2d(32, 3, 3, padding=1)
        self.decoder = dec

        class _Q(nn.Module):
            def __init__(self):
                super().__init__()
                self.embedding = nn.Embedding(n_embed, embed_dim)

        self.quantize = _Q()
        self.quant_conv = nn.Conv2d(16, embed_dim, 1)
        self.post_quant_conv = nn.Conv2d(embed_dim, 16, 1)

    def encode_indices(self, x):
        h = self.encoder.conv_in(x)
        for blk in self.encoder.conv_blocks:
            for j, r in enumerate(blk.res):
                h = r(h)
                if j < len(blk.attn):
                    h = blk.attn[j](h)
            if hasattr(blk, "downsample"):
                h = blk.downsample(h)
        for m in self.encoder.mid:
            h = m(h)
        h = self.encoder.conv_out(F.silu(self.encoder.norm_out(h)))
        z = self.quant_conv(h)                       # (B, e, g, g)
        b, e, g, _ = z.shape
        zf = z.permute(0, 2, 3, 1).reshape(-1, e)
        zn = F.normalize(zf, dim=-1)
        en = F.normalize(self.quantize.embedding.weight, dim=-1)
        d = ((zn ** 2).sum(1, keepdim=True) + (en ** 2).sum(1)[None]
             - 2 * zn @ en.T)
        return d.argmin(-1).reshape(b, g * g)

    def decode_indices(self, idx):
        b, n = idx.shape
        g = int(round(n ** 0.5))
        zq = F.normalize(self.quantize.embedding(idx.reshape(-1)), dim=-1)
        zq = zq.reshape(b, g, g, -1).permute(0, 3, 1, 2)
        h = self.decoder.conv_in(self.post_quant_conv(zq))
        for m in self.decoder.mid:
            h = m(h)
        for blk in self.decoder.conv_blocks:
            for j, r in enumerate(blk.res):
                h = r(h)
                if j < len(blk.attn):
                    h = blk.attn[j](h)
            if hasattr(blk, "upsample"):
                h = blk.upsample(h)
        return self.decoder.conv_out(F.silu(self.decoder.norm_out(h)))


def test_llamagen_vq_checkpoint_golden(tmp_path):
    twin = TorchVQModel().eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for name, p in twin.named_parameters():
            if "norm" in name and name.endswith("weight"):
                p.copy_(1.0 + 0.1 * torch.randn(p.shape, generator=g))
            else:
                p.copy_(0.1 * torch.randn(p.shape, generator=g))

    path = tmp_path / "vq_ds16_c2i.pt"
    torch.save({"model": twin.state_dict()}, path)

    model, params = load_llamagen_vq(str(path))
    assert model.config.ch == 32 and model.config.ch_mult == (1, 2)
    assert model.config.num_res_blocks == 1
    assert model.config.n_embed == 64 and model.config.embed_dim == 8

    x = np.random.default_rng(1).uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref_idx = twin.encode_indices(xt)
        ref_img = twin.decode_indices(ref_idx).permute(0, 2, 3, 1).numpy()

    idx = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 method="encode"))
    np.testing.assert_array_equal(idx, ref_idx.numpy())
    img = np.asarray(model.apply({"params": params}, jnp.asarray(idx),
                                 method="decode_indices"))
    np.testing.assert_allclose(img, ref_img, atol=1e-4, rtol=1e-3)
