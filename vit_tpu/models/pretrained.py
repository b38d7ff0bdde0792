"""Pretrained TATiTok tokenizer loading (reference test_import.py:18-29).

The reference loads an external Bytedance ``oned_tokenizer`` checkpoint (omegaconf
config.yaml + checkpoint-*/unwrapped_model/pytorch_model.bin) to get the frozen
tokenizer used by VideoGPT training (train_videogpt.py:99-101).

``get_titok_tokenizer(path)`` accepts either
  (a) a vit_tpu orbax checkpoint dir written by train_tatitok.py, or
  (b) a Bytedance-format folder — config.yaml + pytorch_model.bin — whose torch
      weights are converted in-process (torch-cpu reads the file; the mapping below
      covers every parameter family of blocks.py:208-505).

Returns (TATiTok module, params tree).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.models.tatitok import TATiTok, TATiTokConfig


def _t(x):
    return np.ascontiguousarray(np.asarray(x).T)


def convert_bytedance_state_dict(sd: Dict, config: TATiTokConfig) -> Dict:
    """Map Bytedance TiTok/TATiTok torch param names → vit_tpu TATiTok param tree.

    Attention: nn.MultiheadAttention packs in_proj as [q; k; v] blocks of (W, W) —
    identical ordering to our fused qkv Dense with the "(three h d)" head split, so
    conversion is a plain transpose.
    """

    def arr(key):
        return np.asarray(sd[key].float().numpy() if hasattr(sd[key], "float")
                          else sd[key], np.float32)

    p = config.patch_size
    out: Dict = {"latent_tokens": arr("latent_tokens"),
                 "quantize": {"embedding": arr("quantize.embedding.weight")}}

    def convert_block_stack(prefix, n_layers):
        layers = {}
        for i in range(n_layers):
            b = f"{prefix}.transformer.{i}"
            layers[f"layer_{i}"] = {
                "ln1": {"scale": arr(f"{b}.ln_1.weight"),
                        "bias": arr(f"{b}.ln_1.bias")},
                "ln2": {"scale": arr(f"{b}.ln_2.weight"),
                        "bias": arr(f"{b}.ln_2.bias")},
                "attn": {
                    "qkv": {"kernel": _t(arr(f"{b}.attn.in_proj_weight")),
                            "bias": arr(f"{b}.attn.in_proj_bias")},
                    "out_proj": {"kernel": _t(arr(f"{b}.attn.out_proj.weight")),
                                 "bias": arr(f"{b}.attn.out_proj.bias")},
                },
                "mlp": {
                    "fc1": {"kernel": _t(arr(f"{b}.mlp.c_fc.weight")),
                            "bias": arr(f"{b}.mlp.c_fc.bias")},
                    "fc2": {"kernel": _t(arr(f"{b}.mlp.c_proj.weight")),
                            "bias": arr(f"{b}.mlp.c_proj.bias")},
                },
            }
        return layers

    n_layers = config.trans_config.n_layers
    width = config.width

    # --- encoder ---
    pe = arr("encoder.patch_embed.weight")           # (W, 3, p, p)
    enc = {
        "patch_embed": {"kernel": pe.transpose(2, 3, 1, 0).reshape(p * p * 3, width),
                        "bias": arr("encoder.patch_embed.bias")},
        "class_embedding": arr("encoder.class_embedding").reshape(1, width),
        "positional_embedding": arr("encoder.positional_embedding"),
        "latent_token_positional_embedding":
            arr("encoder.latent_token_positional_embedding"),
        "ln_pre": {"scale": arr("encoder.ln_pre.weight"),
                   "bias": arr("encoder.ln_pre.bias")},
        "ln_post": {"scale": arr("encoder.ln_post.weight"),
                    "bias": arr("encoder.ln_post.bias")},
        "transformer": convert_block_stack("encoder", n_layers),
        # 1×1 conv_out (W → token_size): (ts, W, 1, 1) → dense (W, ts)
        "conv_out": {"kernel": _t(arr("encoder.conv_out.weight")[:, :, 0, 0]),
                     "bias": arr("encoder.conv_out.bias")},
    }
    out["encoder"] = enc

    # --- decoder ---
    ffn_w = arr("decoder.ffn.0.weight")              # (p²·3, W, 1, 1)
    conv_out_w = arr("decoder.conv_out.weight")      # (3, 3, 3, 3) OIHW
    dec = {
        "decoder_embed": {"kernel": _t(arr("decoder.decoder_embed.weight")),
                          "bias": arr("decoder.decoder_embed.bias")},
        "class_embedding": arr("decoder.class_embedding").reshape(1, width),
        "positional_embedding": arr("decoder.positional_embedding"),
        "mask_token": arr("decoder.mask_token").reshape(1, 1, width),
        "latent_token_positional_embedding":
            arr("decoder.latent_token_positional_embedding"),
        "ln_pre": {"scale": arr("decoder.ln_pre.weight"),
                   "bias": arr("decoder.ln_pre.bias")},
        "ln_post": {"scale": arr("decoder.ln_post.weight"),
                    "bias": arr("decoder.ln_post.bias")},
        "transformer": convert_block_stack("decoder", n_layers),
        "ffn": {"kernel": _t(ffn_w[:, :, 0, 0]),
                "bias": arr("decoder.ffn.0.bias")},
        "conv_out": {"kernel": conv_out_w.transpose(2, 3, 1, 0),
                     "bias": arr("decoder.conv_out.bias")},
    }
    if config.text_guidance and "decoder.text_guidance_proj.weight" in sd:
        dec["text_guidance_proj"] = {
            "kernel": _t(arr("decoder.text_guidance_proj.weight")),
            "bias": arr("decoder.text_guidance_proj.bias")}
        dec["text_guidance_positional_embedding"] = arr(
            "decoder.text_guidance_positional_embedding")
    out["decoder"] = dec
    return jax.tree.map(jnp.asarray, out)


def _config_from_bytedance_yaml(folder: Path) -> TATiTokConfig:
    import yaml

    cfg = yaml.safe_load((folder / "config.yaml").read_text())
    vq = cfg.get("model", {}).get("vq_model", {})
    ds = cfg.get("dataset", {}).get("preprocessing", {})
    return TATiTokConfig(
        image_size=int(ds.get("crop_size", vq.get("image_size", 256))),
        patch_size=int(vq.get("vit_enc_patch_size", vq.get("patch_size", 16))),
        latent_tokens=int(vq.get("num_latent_tokens", 32)),
        codebook_size=int(vq.get("codebook_size", 4096)),
        latent_dim=int(vq.get("token_size", 12)),
        transformer=str(vq.get("vit_enc_model_size", "base")),
        use_l2_norm=bool(vq.get("use_l2_norm", True)),
        text_guidance=bool(vq.get("is_legacy", False) is False
                           and "text_context_length" in vq),
        dtype=jnp.float32,
    )


class FrozenTokenizer:
    """Uniform frozen-tokenizer interface over TiTok (author's) and TATiTok
    (Bytedance) models: image batch → code indices and back. This is what VideoGPT
    training consumes (reference train_videogpt.py:124-127, 146-158)."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self._is_tatitok = isinstance(model, TATiTok)

    @property
    def latent_tokens(self) -> int:
        return self.model.config.latent_tokens

    @property
    def codebook_size(self) -> int:
        return self.model.config.codebook_size

    @property
    def image_size(self) -> int:
        return self.model.config.image_size

    def encode_indices(self, frames):
        """(N, H, W, 3) [0,1] → (N, K) int32 codes."""
        if self._is_tatitok:
            _, result = self.model.apply({"params": self.params}, frames,
                                         method="encode")
            return result["min_encoding_indices"]
        return self.model.apply({"params": self.params}, frames, method="encode")

    def decode_indices(self, indices):
        """(N, K) codes → (N, H, W, 3) images."""
        method = "decode_tokens" if self._is_tatitok else "decode_indices"
        return self.model.apply({"params": self.params}, indices, method=method)


def get_titok_tokenizer(path: str) -> Tuple[TATiTok, Dict]:
    """Load a frozen TATiTok tokenizer (reference get_titok_tokenizer,
    test_import.py:18-29)."""
    folder = Path(path)
    if (folder / "best_config.json").exists():       # vit_tpu orbax checkpoint
        from vit_tpu.train.checkpoint import Checkpointer
        from vit_tpu.train.optim import make_optimizer
        from vit_tpu.train.state import TrainState
        from vit_tpu.utils.config import dataclass_from_dict

        cfg = dataclass_from_dict(
            TATiTokConfig, json.loads((folder / "best_config.json").read_text()))
        cfg.__post_init__()
        model = TATiTok(cfg)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))["params"]
        tx = make_optimizer(1e-4, 1, 10, 1e-5, 0.0)
        state = Checkpointer(str(folder)).restore(TrainState.create(params, tx),
                                                  tag="best")
        return model, state.params

    # Bytedance oned_tokenizer format
    import torch

    config = _config_from_bytedance_yaml(folder)
    ckpts = sorted(folder.glob("checkpoint-*/unwrapped_model/pytorch_model.bin"))
    if not ckpts:
        ckpts = sorted(folder.glob("pytorch_model.bin"))
    if not ckpts:
        raise FileNotFoundError(f"no pytorch_model.bin under {folder}")
    sd = torch.load(ckpts[-1], map_location="cpu", weights_only=False)
    model = TATiTok(config)
    params = convert_bytedance_state_dict(sd, config)
    return model, params
