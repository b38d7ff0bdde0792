"""LlamaGen VQGAN (taming-style CNN tokenizer) — checkpoint-interop port.

The reference's train_llamagen_titok.py freezes an EXTERNAL LlamaGen ``VQ_models``
checkpoint (reference train_llamagen_titok.py:140-155, ``{"model": state_dict}``
.pt files) and trains TiTok over its code sequences. This module is a Flax/NHWC
port of that VQGAN's inference surface — encode(images)→code indices and
decode_code(indices)→images — plus a converter that loads the torch checkpoint,
inferring every architecture hyperparameter (ch, ch_mult, res blocks per level,
attention placement, z_channels, codebook size/dim) from the state-dict shapes so
config drift between LlamaGen variants (VQ-8 / VQ-16) can't silently corrupt the
mapping.

Architecture (taming VQGAN as adopted by LlamaGen): conv_in → per-level
[ResnetBlock ×n (+AttnBlock)] with stride-2 Downsample (asymmetric (0,1) pad) →
mid Resnet/Attn/Resnet → GroupNorm(32)/swish/conv_out → 1×1 quant_conv →
L2-normalized nearest-code lookup; decoder mirrors with nearest-neighbor 2×
Upsample and num_res_blocks+1 blocks per level.

Training of this CNN tokenizer itself is out of scope (the reference also only
consumes it frozen); the TPU-native trainable tokenizer family is ViT-VQGAN
(vit_tpu/models/vit_vqgan.py).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vit_tpu.kernels.vq import nearest_code


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _gn(name):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32, name=name)


class ResnetBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = _gn("norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(_swish(h))
        h = _gn("norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(_swish(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = _gn("norm")(x)
        q = nn.Conv(c, (1, 1), name="q")(h).reshape(b, hh * ww, c)
        k = nn.Conv(c, (1, 1), name="k")(h).reshape(b, hh * ww, c)
        v = nn.Conv(c, (1, 1), name="v")(h).reshape(b, hh * ww, c)
        w = jnp.einsum("bqc,bkc->bqk", q, k,
                       preferred_element_type=jnp.float32) * (c ** -0.5)
        w = jax.nn.softmax(w, axis=-1)
        h = jnp.einsum("bqk,bkc->bqc", w, v).reshape(b, hh, ww, c)
        return x + nn.Conv(c, (1, 1), name="proj_out")(h)


@dataclasses.dataclass(eq=False)
class LlamaGenVQConfig:
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    enc_attn: Sequence[int] = ()      # per-level attn-block counts (encoder)
    dec_attn: Sequence[int] = ()      # per-level attn-block counts (decoder, in
    #                                   DECODER order: highest-channel level first)
    z_channels: int = 256
    embed_dim: int = 8
    n_embed: int = 16384
    l2_norm: bool = True

    def __post_init__(self):
        self.num_levels = len(self.ch_mult)
        if not self.enc_attn:
            self.enc_attn = (0,) * self.num_levels
        if not self.dec_attn:
            self.dec_attn = (0,) * self.num_levels
        self.downsample_factor = 2 ** (self.num_levels - 1)


class LlamaGenEncoder(nn.Module):
    config: LlamaGenVQConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(cfg.ch, (3, 3), padding=1, name="conv_in")(x)
        for i, mult in enumerate(cfg.ch_mult):
            out_ch = cfg.ch * mult
            for j in range(cfg.num_res_blocks):
                h = ResnetBlock(out_ch, name=f"down_{i}_res_{j}")(h)
                if j < cfg.enc_attn[i]:
                    h = AttnBlock(name=f"down_{i}_attn_{j}")(h)
            if i != cfg.num_levels - 1:
                # taming Downsample: stride-2 conv with asymmetric (0,1) pad
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(out_ch, (3, 3), strides=2, padding="VALID",
                            name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], name="mid_res_0")(h)
        h = AttnBlock(name="mid_attn_0")(h)
        h = ResnetBlock(h.shape[-1], name="mid_res_1")(h)
        h = _gn("norm_out")(h)
        return nn.Conv(cfg.z_channels, (3, 3), padding=1,
                       name="conv_out")(_swish(h))


class LlamaGenDecoder(nn.Module):
    config: LlamaGenVQConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        mults = list(reversed(cfg.ch_mult))   # decoder runs coarse→fine
        h = nn.Conv(cfg.ch * mults[0], (3, 3), padding=1, name="conv_in")(z)
        h = ResnetBlock(h.shape[-1], name="mid_res_0")(h)
        h = AttnBlock(name="mid_attn_0")(h)
        h = ResnetBlock(h.shape[-1], name="mid_res_1")(h)
        for i, mult in enumerate(mults):
            out_ch = cfg.ch * mult
            for j in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(out_ch, name=f"up_{i}_res_{j}")(h)
                if j < cfg.dec_attn[i]:
                    h = AttnBlock(name=f"up_{i}_attn_{j}")(h)
            if i != cfg.num_levels - 1:
                b, hh, ww, c = h.shape
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)  # nearest 2×
                h = nn.Conv(c, (3, 3), padding=1, name=f"up_{i}_upsample")(h)
        h = _gn("norm_out")(h)
        return nn.Conv(3, (3, 3), padding=1, name="conv_out")(_swish(h))


class LlamaGenVQ(nn.Module):
    """Inference surface of the frozen LlamaGen tokenizer."""

    config: LlamaGenVQConfig

    def setup(self):
        cfg = self.config
        self.encoder = LlamaGenEncoder(cfg)
        self.decoder = LlamaGenDecoder(cfg)
        self.quant_conv = nn.Conv(cfg.embed_dim, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(cfg.z_channels, (1, 1),
                                       name="post_quant_conv")
        self.codebook = self.param("codebook", nn.initializers.normal(1.0),
                                   (cfg.n_embed, cfg.embed_dim), jnp.float32)

    def encode(self, images) -> jax.Array:
        """(B, H, W, 3) → (B, (H/f)·(W/f)) int32 code indices (row-major grid)."""
        z = self.quant_conv(self.encoder(images))
        b, h, w, c = z.shape
        idx = nearest_code(z.reshape(-1, c), self.codebook,
                           l2_normalize=self.config.l2_norm)
        return idx.reshape(b, h * w)

    def decode_indices(self, indices) -> jax.Array:
        """(B, N) codes → (B, H, W, 3)."""
        cfg = self.config
        b, n = indices.shape
        g = int(round(n ** 0.5))
        zq = jnp.take(self.codebook, indices.reshape(-1), axis=0)
        if cfg.l2_norm:
            zq = zq / jnp.maximum(
                jnp.linalg.norm(zq, axis=-1, keepdims=True), 1e-12)
        zq = zq.reshape(b, g, g, cfg.embed_dim)
        return self.decoder(self.post_quant_conv(zq))

    def __call__(self, images):
        idx = self.encode(images)
        return self.decode_indices(idx), idx


# --------------------------- torch checkpoint loading ---------------------------

def _infer_config(sd: Dict) -> LlamaGenVQConfig:
    """Derive every hyperparameter from state-dict shapes/keys."""
    ch = int(np.asarray(sd["encoder.conv_in.weight"]).shape[0])
    levels = 1 + max(int(m.group(1)) for k in sd
                     if (m := re.match(r"encoder\.conv_blocks\.(\d+)\.", k)))
    ch_mult, enc_attn, dec_attn = [], [], []
    num_res = 1 + max(int(m.group(1)) for k in sd
                      if (m := re.match(r"encoder\.conv_blocks\.0\.res\.(\d+)\.", k)))
    for i in range(levels):
        w = np.asarray(sd[f"encoder.conv_blocks.{i}.res.0.conv1.weight"])
        ch_mult.append(int(w.shape[0]) // ch)
        enc_attn.append(len({k.split(".")[4] for k in sd if k.startswith(
            f"encoder.conv_blocks.{i}.attn.")}))
        dec_attn.append(len({k.split(".")[4] for k in sd if k.startswith(
            f"decoder.conv_blocks.{i}.attn.")}))
    z_channels = int(np.asarray(sd["encoder.conv_out.weight"]).shape[0])
    emb = np.asarray(sd["quantize.embedding.weight"])
    return LlamaGenVQConfig(ch=ch, ch_mult=tuple(ch_mult),
                            num_res_blocks=num_res,
                            enc_attn=tuple(enc_attn), dec_attn=tuple(dec_attn),
                            z_channels=z_channels, embed_dim=int(emb.shape[1]),
                            n_embed=int(emb.shape[0]))


def _conv_w(t):
    return np.ascontiguousarray(np.asarray(t).transpose(2, 3, 1, 0))  # OIHW→HWIO


def convert_llamagen_state_dict(sd: Dict) -> Tuple[LlamaGenVQConfig, Dict]:
    """torch ``VQModel`` state dict → (config, flax params tree)."""

    def arr(k):
        v = sd[k]
        return np.asarray(v.float().numpy() if hasattr(v, "float") else v,
                          np.float32)

    cfg = _infer_config(sd)
    out: Dict = {"codebook": arr("quantize.embedding.weight")}

    def put(dst_path, torch_prefix, kind):
        node = out
        for p in dst_path.split("/")[:-1]:
            node = node.setdefault(p, {})
        leaf = dst_path.split("/")[-1]
        if kind == "conv":
            node[leaf] = {"kernel": _conv_w(arr(f"{torch_prefix}.weight")),
                          "bias": arr(f"{torch_prefix}.bias")}
        else:  # groupnorm
            node[leaf] = {"scale": arr(f"{torch_prefix}.weight"),
                          "bias": arr(f"{torch_prefix}.bias")}

    def convert_res(dst, src):
        put(f"{dst}/norm1", f"{src}.norm1", "gn")
        put(f"{dst}/conv1", f"{src}.conv1", "conv")
        put(f"{dst}/norm2", f"{src}.norm2", "gn")
        put(f"{dst}/conv2", f"{src}.conv2", "conv")
        if f"{src}.nin_shortcut.weight" in sd:
            put(f"{dst}/nin_shortcut", f"{src}.nin_shortcut", "conv")

    def convert_attn(dst, src):
        put(f"{dst}/norm", f"{src}.norm", "gn")
        for nm in ("q", "k", "v", "proj_out"):
            put(f"{dst}/{nm}", f"{src}.{nm}", "conv")

    for side, updown in (("encoder", "down"), ("decoder", "up")):
        put(f"{side}/conv_in", f"{side}.conv_in", "conv")
        for i in range(cfg.num_levels):
            blocks = cfg.num_res_blocks + (1 if side == "decoder" else 0)
            for j in range(blocks):
                if f"{side}.conv_blocks.{i}.res.{j}.conv1.weight" not in sd:
                    continue
                convert_res(f"{side}/{updown}_{i}_res_{j}",
                            f"{side}.conv_blocks.{i}.res.{j}")
            attn_n = (cfg.enc_attn if side == "encoder" else cfg.dec_attn)[i]
            for j in range(attn_n):
                convert_attn(f"{side}/{updown}_{i}_attn_{j}",
                             f"{side}.conv_blocks.{i}.attn.{j}")
            ds_key = f"{side}.conv_blocks.{i}.{'downsample' if side == 'encoder' else 'upsample'}.conv.weight"
            if ds_key in sd:
                put(f"{side}/{updown}_{i}_{'downsample' if side == 'encoder' else 'upsample'}",
                    ds_key.rsplit(".weight", 1)[0], "conv")
        for j in range(2):
            convert_res(f"{side}/mid_res_{j}", f"{side}.mid.{0 if j == 0 else 2}")
        convert_attn(f"{side}/mid_attn_0", f"{side}.mid.1")
        put(f"{side}/norm_out", f"{side}.norm_out", "gn")
        put(f"{side}/conv_out", f"{side}.conv_out", "conv")

    put("quant_conv", "quant_conv", "conv")
    put("post_quant_conv", "post_quant_conv", "conv")
    return cfg, jax.tree.map(jnp.asarray, out)


def load_llamagen_vq(path: str) -> Tuple[LlamaGenVQ, Dict]:
    """Load a LlamaGen ``{"model": state_dict}`` .pt checkpoint
    (reference train_llamagen_titok.py:153)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    cfg, params = convert_llamagen_state_dict(sd)
    return LlamaGenVQ(cfg), params
