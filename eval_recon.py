"""Reconstruction-quality evaluation: PSNR + perceptual distance for a trained
tokenizer checkpoint (the BASELINE.json north-star "recon PSNR/LPIPS parity" tool —
the reference has no eval script; its de-facto validation is wandb image grids,
SURVEY.md §4).

Usage:
  python eval_recon.py --ckpt titok_models --model titok --dataset synthetic --bs 16
  python eval_recon.py --ckpt titok_models/vit_vqgan --model vit_vqgan \
      --dataset imagenet --data_dir /path/to/imagenet

Prints one JSON line:
  {"psnr": ..., "ssim": ..., "perceptual": ..., "codebook_usage": ..., "n": N}.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.train.checkpoint import Checkpointer
from vit_tpu.train.optim import make_optimizer
from vit_tpu.train.state import TrainState
from vit_tpu.utils.config import dataclass_from_dict
from vit_tpu.utils.metrics import psnr, ssim


def load_model(args):
    import json as _json

    cfg_dict = _json.loads((Path(args.ckpt) / "best_config.json").read_text())
    if args.model == "titok":
        from vit_tpu.models.titok import TiTok, TiTokConfig

        cfg = dataclass_from_dict(TiTokConfig, cfg_dict)
        cls = TiTok
    elif args.model == "vit_vqgan":
        from vit_tpu.models.vit_vqgan import ViTVQGAN, ViTVQGANConfig

        cfg = dataclass_from_dict(ViTVQGANConfig, cfg_dict)
        cls = ViTVQGAN
    elif args.model == "tatitok":
        from vit_tpu.models.tatitok import TATiTok, TATiTokConfig

        cfg = dataclass_from_dict(TATiTokConfig, cfg_dict)
        cls = TATiTok
    else:
        raise ValueError(args.model)
    cfg.__post_init__()
    model = cls(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))["params"]
    tx = make_optimizer(1e-4, 1, 10, 1e-5, 0.0)
    use_ema = getattr(args, "use_ema", False)
    if use_ema:
        from vit_tpu.train.checkpoint import has_ema

        if not has_ema(args.ckpt, args.tag):
            raise ValueError(f"--use_ema: checkpoint {args.ckpt}/{args.tag} "
                             "holds no EMA average (train with --ema_decay)")
    state = Checkpointer(args.ckpt).restore(
        TrainState.create(params, tx, ema_decay=1.0 if use_ema else 0.0),
        tag=args.tag)
    return model, (state.ema_params if use_ema else state.params), cfg


def main():
    from vit_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument('--ckpt', type=str, required=True)
    parser.add_argument('--model', type=str, default='titok',
                        choices=['titok', 'vit_vqgan', 'tatitok'])
    parser.add_argument('--tag', type=str, default='best')
    parser.add_argument('--use_ema', action='store_true',
                        help='eval the EMA weight average (--ema_decay runs)')
    parser.add_argument('--dataset', type=str, default='synthetic',
                        choices=['synthetic', 'imagenet', 'dmlab', 'minecraft'])
    parser.add_argument('--data_dir', type=str, default=None)
    parser.add_argument('--bs', type=int, default=16)
    parser.add_argument('--batches', type=int, default=10)
    parser.add_argument('--synthetic_mode', type=str, default='shapes',
                        choices=['shapes', 'noise'],
                        help="synthetic data mode (must match training; "
                             "train_titok --dataset synthetic uses 'shapes')")
    parser.add_argument('--perceptual_weights', type=str, default=None)
    parser.add_argument('--lpips_weights', type=str, default=None,
                        help='.npz from scripts/convert_lpips_weights.py '
                             '(or "random" for an architecture-only smoke); '
                             'adds an "lpips" field to the output — the '
                             'BASELINE.md "PSNR/LPIPS parity" north star')
    args = parser.parse_args()

    model, params, cfg = load_model(args)

    if args.dataset == 'synthetic':
        from vit_tpu.data.synthetic import SyntheticImageLoader

        # mode must match what the tokenizer was trained on: train_titok's
        # synthetic path uses structured 'shapes' images — evaluating a
        # shapes-trained model on i.i.d. noise reads as ~7 dB PSNR noise-floor.
        loader = SyntheticImageLoader(cfg.image_size, args.bs,
                                      steps_per_epoch=args.batches, seed=1,
                                      mode=args.synthetic_mode)
    elif args.dataset == 'imagenet':
        from vit_tpu.data.imagenet import get_imagenet_loaders

        loader = get_imagenet_loaders(cfg.image_size, args.bs,
                                      data_dir=args.data_dir)[1]
    else:
        from vit_tpu.data.video import (get_dmlab_image_loaders,
                                        get_minecraft_image_loaders)

        fn = (get_dmlab_image_loaders if args.dataset == 'dmlab'
              else get_minecraft_image_loaders)
        loader = fn(args.bs, dataset_path=args.data_dir)[0]

    perceptual = None
    if args.perceptual_weights:
        from vit_tpu.losses.perceptual import PerceptualLoss

        if args.perceptual_weights == "random":
            print("=" * 78, file=sys.stderr)
            print("WARNING: perceptual metric uses RANDOMLY INITIALIZED ConvNeXt "
                  "weights.\nThe number below is NOT comparable to LPIPS or to the "
                  "reference's perceptual\nloss — convert real IMAGENET1K_V1 weights "
                  "with scripts/convert_perceptual_weights.py\nand pass the .npz "
                  "instead.", file=sys.stderr)
            print("=" * 78, file=sys.stderr)
            weights = PerceptualLoss.init_params()
        else:
            weights = PerceptualLoss.load_params(args.perceptual_weights)
        perceptual = PerceptualLoss(weights)

    lpips = None
    if args.lpips_weights:
        from vit_tpu.losses import lpips as lpips_mod

        if args.lpips_weights == "random":
            print("WARNING: lpips metric uses RANDOM weights — architecture "
                  "smoke only, NOT comparable to published LPIPS numbers; "
                  "convert real weights with scripts/convert_lpips_weights.py.",
                  file=sys.stderr)
            lp_params = lpips_mod.init_params()
        else:
            lp_params = lpips_mod.load_params(args.lpips_weights)
        lpips = jax.jit(lpips_mod.lpips_fn(lp_params))

    if args.model == "tatitok":
        fwd = jax.jit(lambda p, x: model.apply({"params": p}, x)[0])
        idx_fn = jax.jit(lambda p, x: model.apply(
            {"params": p}, x, method="encode")[1]["min_encoding_indices"])
    else:
        fwd = jax.jit(lambda p, x: model.apply({"params": p}, x)[0])
        idx_fn = jax.jit(lambda p, x: model.apply({"params": p}, x, method="encode"))

    psnrs, ssims, percs, lpipss, n = [], [], [], [], 0
    usage = np.zeros(cfg.codebook_size, np.float32)
    ssim_fn = jax.jit(ssim)
    for i, (images, _) in enumerate(loader):
        if i >= args.batches:
            break
        x = jnp.asarray(images)
        recon = jnp.clip(fwd(params, x), 0.0, 1.0)
        psnrs.append(np.asarray(psnr(recon, jnp.clip(x, 0.0, 1.0))))
        if min(x.shape[1:3]) >= 11:  # SSIM 11x11 VALID window (train/loop.py)
            ssims.append(np.asarray(ssim_fn(recon, jnp.clip(x, 0.0, 1.0))))
        if perceptual is not None:
            percs.append(float(perceptual(recon, x)))
        if lpips is not None:
            lpipss.append(np.asarray(lpips(recon, jnp.clip(x, 0.0, 1.0))))
        usage[np.asarray(idx_fn(params, x)).reshape(-1)] = 1.0
        n += x.shape[0]

    out = {"psnr": round(float(np.concatenate(psnrs).mean()), 3),
           "codebook_usage": round(float(usage.mean()), 4), "n": n}
    # 'ssim' is always present so downstream dict consumers never KeyError:
    # null when every eval image is smaller than SSIM's 11x11 window
    # (advisor r4: keep the output schema stable)
    if ssims:
        out["ssim"] = round(float(np.concatenate(ssims).mean()), 4)
    else:
        print("eval_recon: images smaller than the 11x11 SSIM window — "
              "emitting ssim: null", file=sys.stderr)
        out["ssim"] = None
    if percs:
        out["perceptual"] = round(float(np.mean(percs)), 5)
    if lpipss:
        out["lpips"] = round(float(np.concatenate(lpipss).mean()), 5)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
