"""Full-model golden parity: ViT-VQGAN forward vs the reference math in torch,
sharing one set of weights (reference train_vit_vqgan.py:18-91). Completes
weight-for-weight golden coverage of all seven model families.

Differences from TiTok captured here (train_vit_vqgan.py:28,38-43,61-77): one latent
per patch (latent_tokens = n_patches), zero extra tokens on both ViTs, ALL encoder
outputs projected, decoder treats the K latents as a (K, 1) one-pixel-wide image.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tests.test_golden_titok import torch_vit_forward
from vit_tpu.models.vit_vqgan import ViTVQGAN, ViTVQGANConfig

TOL = 1e-3


def test_vit_vqgan_full_forward_golden():
    cfg = ViTVQGANConfig(image_size=16, patch_size=4, codebook_size=32,
                         latent_dim=6, transformer="S", dtype=jnp.float32,
                         attn_impl="xla")
    for name in ("enc_vit_config", "dec_vit_config"):
        sub = getattr(cfg, name)
        sub.trans_config = sub.trans_config.replace(n_layers=2, n_heads=2,
                                                    n_embd=32)
    cfg.n_embd = 32
    model = ViTVQGAN(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    recon, indices, qloss = model.apply({"params": params}, x)

    # ---- torch reference forward with the same weights ----
    xt = torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)).copy())

    # encoder: ViT with 0 extra tokens, project ALL outputs
    # (train_vit_vqgan.py:38-43)
    enc_out = torch_vit_forward(params["encoder"]["vit"], xt,
                                cfg.enc_vit_config, 32, 2, 2)
    lat = enc_out @ torch.from_numpy(
        np.asarray(params["encoder"]["proj"]["kernel"])) \
        + torch.from_numpy(np.asarray(params["encoder"]["proj"]["bias"]))

    # quantizer: identical simple L2-norm VQ (train_vit_vqgan.py:45-59)
    zn = F.normalize(lat, dim=-1)
    cb = torch.from_numpy(np.asarray(params["quant"]["codebook"]))
    idx = torch.cdist(zn, F.normalize(cb, dim=-1)).argmin(dim=-1)
    quantized = cb[idx]                                  # unnormalized lookup
    want_qloss = float((quantized - zn).pow(2).mean() * 1.25)

    # decoder: latents as a (K, 1) image, patch 1 (train_vit_vqgan.py:61-77)
    z = quantized @ torch.from_numpy(
        np.asarray(params["decoder"]["quant_proj"]["kernel"])) \
        + torch.from_numpy(np.asarray(params["decoder"]["quant_proj"]["bias"]))
    z_img = z.transpose(1, 2).unsqueeze(-1)              # (b, n_embd, K, 1) NCHW
    dec_out = torch_vit_forward(params["decoder"]["vit"], z_img,
                                cfg.dec_vit_config, 32, 2, 2)
    dec_out = dec_out[:, :cfg.n_patches]
    img = dec_out @ torch.from_numpy(
        np.asarray(params["decoder"]["embd_proj"]["kernel"])) \
        + torch.from_numpy(np.asarray(params["decoder"]["embd_proj"]["bias"]))
    g, p = cfg.grid_size, cfg.patch_size
    img = img.view(2, g, g, p, p, 3).permute(0, 1, 3, 2, 4, 5).reshape(
        2, g * p, g * p, 3)

    np.testing.assert_array_equal(np.asarray(indices), idx.numpy())
    np.testing.assert_allclose(float(qloss), want_qloss, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(recon), img.numpy(), atol=TOL, rtol=TOL)
