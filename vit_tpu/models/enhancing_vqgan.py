""""Enhancing" ViT-VQGAN — the self-contained alternative implementation
(reference train_enhancing_vitvqgan.py:40-272).

Differences from the minimal-core ViT-VQGAN, all reproduced here:
  - fixed (non-trainable) 2-D sin/cos positional embeddings (reference :40-87);
  - transformer with Tanh feed-forward (not GELU), bias-free fused QKV, an attention
    output projection, and a final LayerNorm after the block stack (reference :104-169);
  - Xavier-uniform init for Linear/conv weights (reference :90-101, "following
    official JAX ViT");
  - pre-quant / post-quant projections around the codebook (reference :259-261);
  - ConvTranspose2d(k=s=patch) pixel head. A stride==kernel transposed conv is exactly
    per-token Dense → depth-to-space, so it is implemented as one MXU matmul;
    ``get_last_layer`` exposes its kernel for GAN-style adaptive loss balancing
    (reference :221-236).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import linen as nn

from vit_tpu.ops.attention import fused_qkv_attention
from vit_tpu.quantize.vq import Quantizer


def sincos_2d_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """Fixed 2-D sin/cos embeddings (reference train_enhancing_vitvqgan.py:40-87):
    half the channels encode the row coordinate, half the column, each as
    [sin(pos·ω), cos(pos·ω)] with ω_k = 1/10000^(2k/D)."""
    assert embed_dim % 4 == 0

    def one_axis(pos):
        dim = embed_dim // 2
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_w, grid_h = np.meshgrid(np.arange(grid_size, dtype=np.float32),
                                 np.arange(grid_size, dtype=np.float32))
    return np.concatenate([one_axis(grid_h), one_axis(grid_w)],
                          axis=1).astype(np.float32)


def xavier_uniform_2d(key, shape, dtype=jnp.float32):
    return nn.initializers.xavier_uniform()(key, shape, dtype)


@dataclasses.dataclass(eq=False)
class EnhancingVQGANConfig:
    """Mirror of the reference ViTVQGANConfig (train_enhancing_vitvqgan.py:20-34).
    The encoder/decoder dims are fixed at the reference's hard-coded ViT-Base values
    (dim 768, depth 12, heads 12, mlp 3072, head_dim 64 — reference :177-178, 215)."""

    image_size: int
    patch_size: int
    codebook_size: int
    latent_dim: int
    transformer: str = "B"   # accepted for config parity; dims are fixed (see above)

    dim: int = 768
    depth: int = 12
    heads: int = 12
    dim_head: int = 64
    mlp_dim: int = 3072

    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    scan_layers: bool = False   # compile the stack as ONE lax.scan over stacked
                                # params (see core/transformer.py scan_layers);
                                # param tree: layers/{attn_norm,attn,ff_norm,
                                # ff1,ff2} with a leading depth axis vs the
                                # flat suffixed default (attn_norm_0, ...)
    remat: bool = False         # jax.checkpoint each scanned block

    def __post_init__(self):
        self.grid_size = self.image_size // self.patch_size
        self.n_patches = self.grid_size ** 2
        self.latent_tokens = self.n_patches

    def replace(self, **kw) -> "EnhancingVQGANConfig":
        return dataclasses.replace(self, **kw)


class EnhancingAttention(nn.Module):
    """Bias-free QKV + output projection (reference :129-152)."""

    config: EnhancingVQGANConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        inner = cfg.dim_head * cfg.heads
        qkv = nn.Dense(inner * 3, use_bias=False, kernel_init=xavier_uniform_2d,
                       dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="to_qkv")(x)
        out = fused_qkv_attention(qkv, cfg.heads, impl=cfg.attn_impl)
        return nn.Dense(cfg.dim, kernel_init=xavier_uniform_2d,
                        bias_init=nn.initializers.zeros, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="to_out")(out)


def _enhancing_block(cfg: EnhancingVQGANConfig, x, suffix: str = ""):
    """One pre-norm block (reference :155-169). Must be called inside an
    nn.compact __call__ — submodules attach to the caller, so the flat
    (suffix="_{i}") and scanned (suffix="") layouts get identical per-block
    param subtrees modulo naming."""
    h = nn.LayerNorm(dtype=jnp.float32, param_dtype=cfg.param_dtype,
                     name=f"attn_norm{suffix}")(x).astype(cfg.dtype)
    x = x + EnhancingAttention(cfg, name=f"attn{suffix}")(h)
    h = nn.LayerNorm(dtype=jnp.float32, param_dtype=cfg.param_dtype,
                     name=f"ff_norm{suffix}")(x).astype(cfg.dtype)
    h = nn.Dense(cfg.mlp_dim, kernel_init=xavier_uniform_2d,
                 bias_init=nn.initializers.zeros, dtype=cfg.dtype,
                 param_dtype=cfg.param_dtype, name=f"ff1{suffix}")(h)
    h = jnp.tanh(h)   # Tanh FFN, a quirk of this variant (reference :117-124)
    h = nn.Dense(cfg.dim, kernel_init=xavier_uniform_2d,
                 bias_init=nn.initializers.zeros, dtype=cfg.dtype,
                 param_dtype=cfg.param_dtype, name=f"ff2{suffix}")(h)
    return x + h


class _EnhancingScanBlock(nn.Module):
    """One block with nn.scan's (carry, ys) calling convention."""

    config: EnhancingVQGANConfig

    @nn.compact
    def __call__(self, x):
        return _enhancing_block(self.config, x), None


class EnhancingTransformer(nn.Module):
    """Pre-norm blocks with Tanh FFN and trailing LayerNorm (reference :155-169).

    ``cfg.scan_layers`` compiles the stack as ONE ``lax.scan`` over a stacked
    ``layers/...`` subtree (leading ``depth`` axis) instead of ``depth``
    unrolled copies — same math, ~depth-fold smaller XLA program. The flat
    suffixed layout (``attn_norm_0, attn_0, ff1_0, ...``) stays the default
    for checkpoint compatibility; convert with
    :func:`stack_enhancing_params` / :func:`unstack_enhancing_params`."""

    config: EnhancingVQGANConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x.astype(cfg.dtype)
        if cfg.scan_layers:
            block = _EnhancingScanBlock
            if cfg.remat:
                block = nn.remat(block, prevent_cse=False)
            stack = nn.scan(
                block,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.depth,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            x, _ = stack(cfg, name="layers")(x)
        else:
            for i in range(cfg.depth):
                x = _enhancing_block(cfg, x, f"_{i}")
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=cfg.param_dtype,
                            name="final_norm")(x).astype(cfg.dtype)


_ENHANCING_BLOCK_KEYS = ("attn_norm", "attn", "ff_norm", "ff1", "ff2")
_ENHANCING_FLAT_RE = re.compile(
    r"^(" + "|".join(_ENHANCING_BLOCK_KEYS) + r")_(\d+)$")


def stack_enhancing_params(tree: dict, depth: int) -> dict:
    """Flat enhancing-transformer params (``attn_norm_0..``) → the scanned
    layout (``layers/{attn_norm,attn,ff_norm,ff1,ff2}`` with each leaf gaining
    a leading ``depth`` axis). Non-layer siblings (``final_norm``) pass
    through unchanged."""
    out = {k: v for k, v in tree.items() if not _ENHANCING_FLAT_RE.match(k)}
    layers = {}
    for base in _ENHANCING_BLOCK_KEYS:
        per = [tree[f"{base}_{i}"] for i in range(depth)]
        layers[base] = jax.tree.map(lambda *xs: jnp.stack(xs), *per)
    out["layers"] = layers
    return out


def unstack_enhancing_params(tree: dict) -> dict:
    """Inverse of :func:`stack_enhancing_params`."""
    layers = tree["layers"]
    n = jax.tree_util.tree_leaves(layers)[0].shape[0]
    out = {k: v for k, v in tree.items() if k != "layers"}
    for base in _ENHANCING_BLOCK_KEYS:
        for i in range(n):
            out[f"{base}_{i}"] = jax.tree.map(lambda x: x[i], layers[base])
    return out


def convert_enhancing_layout(tree: dict, scan_layers: bool) -> dict:
    """Normalize an EnhancingTransformer param subtree to the requested layout
    — no-op (identity) when it already matches. Lets checkpoints cross the
    scan_layers boundary."""
    if scan_layers and "layers" not in tree:
        depth = sum(1 for k in tree if re.fullmatch(r"attn_\d+", k))
        return stack_enhancing_params(tree, depth)
    if not scan_layers and "layers" in tree:
        return unstack_enhancing_params(tree)
    return tree


class EnhancingEncoder(nn.Module):
    """Patch embed + fixed sincos pos-emb + transformer (reference :173-204)."""

    config: EnhancingVQGANConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        p = cfg.patch_size
        x = rearrange(x, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)", p1=p, p2=p)
        x = nn.Dense(cfg.dim, kernel_init=xavier_uniform_2d,
                     bias_init=nn.initializers.zeros, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="patch_embed")(x)
        pos = sincos_2d_pos_embed(cfg.dim, cfg.grid_size)
        x = x + jnp.asarray(pos, cfg.dtype)[None]
        return EnhancingTransformer(cfg, name="transformer")(x)


class EnhancingDecoder(nn.Module):
    """Transformer + fixed pos-emb + ConvTranspose pixel head (reference :207-236)."""

    config: EnhancingVQGANConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        p = cfg.patch_size
        pos = sincos_2d_pos_embed(cfg.dim, cfg.grid_size)
        x = z + jnp.asarray(pos, cfg.dtype)[None]
        x = EnhancingTransformer(cfg, name="transformer")(x)
        # ConvTranspose2d(k=s=p) ≡ per-token Dense(dim → p²·3) + depth-to-space
        img = nn.Dense(p * p * 3, kernel_init=xavier_uniform_2d,
                       bias_init=nn.initializers.zeros, dtype=jnp.float32,
                       param_dtype=cfg.param_dtype, name="to_pixel")(
                           x.astype(jnp.float32))
        return rearrange(img, "b (h w) (p1 p2 c) -> b (h p1) (w p2) c",
                         h=cfg.grid_size, p1=p, p2=p)


class EnhancingViTVQGAN(nn.Module):
    """Composed model with pre/post-quant projections (reference :254-272)."""

    config: EnhancingVQGANConfig

    def setup(self):
        cfg = self.config
        self.encoder = EnhancingEncoder(cfg)
        self.pre_quant_proj = nn.Dense(cfg.latent_dim,
                                       kernel_init=xavier_uniform_2d,
                                       dtype=jnp.float32,
                                       param_dtype=cfg.param_dtype)
        self.quant = Quantizer(cfg.codebook_size, cfg.latent_dim)
        self.quant_proj = nn.Dense(cfg.dim, kernel_init=xavier_uniform_2d,
                                   dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        self.decoder = EnhancingDecoder(cfg)

    def __call__(self, x, deterministic: bool = True):
        latent = self.pre_quant_proj(self.encoder(x).astype(jnp.float32))
        quantized, indices, quantize_loss = self.quant(latent)
        recon = self.decoder(self.quant_proj(quantized.astype(self.config.dtype)))
        return recon, indices, quantize_loss

    def encode(self, x) -> jax.Array:
        return self.quant(self.pre_quant_proj(
            self.encoder(x).astype(jnp.float32)))[1]

    def decode(self, z_quant) -> jax.Array:
        return self.decoder(self.quant_proj(z_quant.astype(self.config.dtype)))

    def decode_indices(self, indices) -> jax.Array:
        return self.decode(self.quant.lookup(indices))

    def get_last_layer(self):
        """Pixel-head kernel, for GAN-style adaptive loss weighting
        (reference :235-236)."""
        return self.decoder.variables["params"]["to_pixel"]["kernel"]
