"""End-to-end integration demo: tokenizer convergence + frozen-tokenizer VideoGPT.

Phase 1: train TiTok-S on structured synthetic images (random rectangles) and report
PSNR before/after — evidence the reconstruction pipeline actually learns.
Phase 2: load that checkpoint FROZEN, train VideoGPT on moving-rectangle videos
(tokenize-in-step), and run KV-cache conditional generation — the full two-model
composition of reference train_videogpt.py with a real (not random) tokenizer.

Usage: python scripts/demo_pipeline.py [--steps1 600] [--steps2 300]
Prints one JSON line per phase.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vit_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps1", type=int, default=600)
    parser.add_argument("--steps2", type=int, default=300)
    parser.add_argument("--image_size", type=int, default=32)
    parser.add_argument("--bs", type=int, default=32)
    parser.add_argument("--ckpt_dir", type=str, default="/tmp/demo_titok")
    args = parser.parse_args()

    from vit_tpu.data.shapes_demo import ShapesImageLoader, ShapesVideoLoader
    from vit_tpu.models.titok import TiTok, TiTokConfig
    from vit_tpu.train.checkpoint import Checkpointer
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState
    from vit_tpu.train.step import make_tokenizer_train_step
    from vit_tpu.utils.metrics import psnr

    # ---------- Phase 1: tokenizer convergence ----------
    cfg = TiTokConfig(args.image_size, 4, 16, 512, 12, "S")
    model = TiTok(cfg)
    rng = jax.random.PRNGKey(0)
    loader = ShapesImageLoader(args.image_size, args.bs,
                               steps_per_epoch=args.steps1)
    params = jax.jit(model.init)(
        rng, jnp.zeros((1, args.image_size, args.image_size, 3)))["params"]
    tx = make_optimizer(3e-4, 100, args.steps1 * 2, 3e-5, 1e-4, clip_norm=1.0)
    state = TrainState.create(params, tx)
    step = jax.jit(make_tokenizer_train_step(model), donate_argnums=(0, 2))
    usage = jnp.zeros((cfg.codebook_size,), jnp.float32)

    eval_batch = jnp.asarray(next(iter(ShapesImageLoader(
        args.image_size, 32, steps_per_epoch=1, seed=999)))[0])
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x)[0])
    psnr0 = float(psnr(jnp.clip(fwd(state.params, eval_batch), 0, 1),
                       eval_batch).mean())
    t0 = time.time()
    for images, _ in loader:
        state, usage, metrics, _ = step(state, jnp.asarray(images), usage, rng)
    loss = float(jax.device_get(metrics["train/loss"]))
    psnr1 = float(psnr(jnp.clip(fwd(state.params, eval_batch), 0, 1),
                       eval_batch).mean())
    Checkpointer(args.ckpt_dir, mode="min").save_if_best(state, loss, config=cfg)
    print(json.dumps({"phase": "titok", "steps": args.steps1,
                      "psnr_init": round(psnr0, 2), "psnr_final": round(psnr1, 2),
                      "final_loss": round(loss, 4),
                      "usage": round(float(usage.mean()), 3),
                      "wall_s": round(time.time() - t0, 1)}))
    assert psnr1 > psnr0 + 3.0, "tokenizer failed to learn"

    # ---------- Phase 2: frozen tokenizer -> VideoGPT ----------
    from vit_tpu.models.videogpt import VideoGPT, VideoGPTConfig, generate_frames

    titok_params = state.params
    vcfg = VideoGPTConfig(cfg.latent_tokens, cfg.codebook_size, "S",
                          max_frames=8, dropout=0.0)
    vmodel = VideoGPT(vcfg)
    vloader = ShapesVideoLoader(16, frames=8, image_size=args.image_size,
                                steps_per_epoch=args.steps2)
    vparams = jax.jit(vmodel.init)(
        rng, jnp.zeros((1, 8, cfg.latent_tokens), jnp.int32))["params"]
    vtx = make_optimizer(3e-4, 50, args.steps2 * 2, 3e-5, 1e-4, clip_norm=None)
    vstate = TrainState.create(vparams, vtx)

    from einops import rearrange

    @jax.jit
    def vstep(vstate, videos):
        b, t = videos.shape[:2]

        def tokenize(v):
            frames = rearrange(v, "b t h w c -> (b t) h w c")
            idx = model.apply({"params": titok_params}, frames, method="encode")
            return rearrange(idx, "(b t) n -> b t n", b=b)

        tokens = jax.lax.stop_gradient(tokenize(videos))

        def loss_fn(p):
            _, loss = vmodel.apply({"params": p}, tokens)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(vstate.params)
        return vstate.apply_gradients(grads=grads), tokens, loss

    t0 = time.time()
    first_loss = None
    for videos, _ in vloader:
        vstate, tokens, loss = vstep(vstate, jnp.asarray(videos, jnp.float32) / 255.0)
        if first_loss is None:
            first_loss = float(jax.device_get(loss))
    last_loss = float(jax.device_get(loss))

    # conditional generation with the KV cache + decode through the tokenizer
    gen_tokens = generate_frames(vmodel, vstate.params, tokens[:2, :4], 4)
    gen_frames = rearrange(gen_tokens, "b (t n) -> (b t) n", n=cfg.latent_tokens)
    gen_video = model.apply({"params": titok_params}, gen_frames,
                            method="decode_indices")
    gen_video = np.asarray(jnp.clip(gen_video, 0, 1))
    print(json.dumps({"phase": "videogpt", "steps": args.steps2,
                      "loss_first": round(first_loss, 3),
                      "loss_last": round(last_loss, 3),
                      "gen_video_shape": list(gen_video.shape),
                      "gen_finite": bool(np.isfinite(gen_video).all()),
                      "wall_s": round(time.time() - t0, 1)}))
    assert last_loss < first_loss, "videogpt failed to learn"
    print("DEMO OK")


if __name__ == "__main__":
    main()
