"""Tokenizer CLI: images ↔ codes with a trained checkpoint (inference surface).

The reference has no serving/inference layer (SURVEY.md §1 — generation is inline in
training loops); this tool closes that gap:

  # encode a folder of images to a .npz of code indices
  python tokenize_images.py encode --ckpt titok_models --model titok \
      --images "imgs/*.png" --out codes.npz

  # decode codes back to PNGs
  python tokenize_images.py decode --ckpt titok_models --model titok \
      --codes codes.npz --out_dir recon/
"""

from __future__ import annotations

import argparse
import glob
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from eval_recon import load_model


def main():
    from vit_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument('mode', choices=['encode', 'decode'])
    parser.add_argument('--ckpt', type=str, required=True)
    parser.add_argument('--model', type=str, default='titok',
                        choices=['titok', 'vit_vqgan', 'tatitok'])
    parser.add_argument('--tag', type=str, default='best')
    parser.add_argument('--images', type=str, default=None)
    parser.add_argument('--codes', type=str, default=None)
    parser.add_argument('--out', type=str, default='codes.npz')
    parser.add_argument('--out_dir', type=str, default='decoded')
    parser.add_argument('--bs', type=int, default=16)
    args = parser.parse_args()

    model, params, cfg = load_model(args)

    if args.mode == 'encode':
        paths = sorted(glob.glob(args.images))
        if not paths:
            raise FileNotFoundError(f"no images match {args.images}")
        if args.model == "tatitok":
            enc = jax.jit(lambda x: model.apply(
                {"params": params}, x,
                method="encode")[1]["min_encoding_indices"])
        else:
            enc = jax.jit(lambda x: model.apply({"params": params}, x,
                                                method="encode"))
        all_codes = []
        for i in range(0, len(paths), args.bs):
            batch = []
            for p in paths[i:i + args.bs]:
                img = Image.open(p).convert("RGB").resize(
                    (cfg.image_size, cfg.image_size), Image.BILINEAR)
                batch.append(np.asarray(img, np.float32) / 255.0)
            all_codes.append(np.asarray(enc(jnp.asarray(np.stack(batch)))))
        codes = np.concatenate(all_codes)
        np.savez(args.out, codes=codes, paths=np.asarray(paths))
        print(f"encoded {len(paths)} images -> {args.out} "
              f"(codes shape {codes.shape})")
    else:
        data = np.load(args.codes, allow_pickle=True)
        codes = data["codes"]
        method = "decode_tokens" if args.model == "tatitok" else "decode_indices"
        dec = jax.jit(lambda c: model.apply({"params": params}, c, method=method))
        out_dir = Path(args.out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for i in range(0, len(codes), args.bs):
            imgs = np.asarray(jnp.clip(dec(jnp.asarray(codes[i:i + args.bs])),
                                       0.0, 1.0))
            for j, img in enumerate(imgs):
                Image.fromarray((img * 255).astype(np.uint8)).save(
                    out_dir / f"{i + j:06d}.png")
        print(f"decoded {len(codes)} code sequences -> {out_dir}/")


if __name__ == '__main__':
    main()
