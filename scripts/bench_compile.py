"""Compile-time + step-time A/B for scan_layers on the flagship step.

The unrolled TiTok-B training step is a ~24-ViT-block XLA program; first
compiles through this environment's TPU tunnel take 10+ minutes (ROADMAP.md).
``scan_layers`` compiles each stack as ONE ``lax.scan`` body, shrinking the
program ~n_layers-fold. This script measures, in one process with the
persistent compilation cache OFF (cold, reproducible):

  lower_s    trace+lower wall time
  compile_s  backend compile wall time   <-- the metric scan_layers targets
  img_per_s  20-step throughput after compile (the step-time cost, if any)

Run both arms:  python scripts/bench_compile.py
                python scripts/bench_compile.py --scan_layers
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scan_layers", action="store_true")
    parser.add_argument("--remat", action="store_true",
                        help="jax.checkpoint each block; required with "
                             "--scan_layers at flagship scale (the scan "
                             "backward saves per-iteration intermediates that "
                             "the unrolled scheduler would have freed: "
                             "21.5G > 15.75G HBM without it)")
    parser.add_argument("--bs", type=int, default=64)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--no_perceptual", action="store_true")
    args = parser.parse_args()

    from vit_tpu.losses.perceptual import PerceptualLoss
    from vit_tpu.models.titok import TiTok, TiTokConfig
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState
    from vit_tpu.train.step import make_tokenizer_train_step

    config = TiTokConfig(image_size=128, patch_size=16, latent_tokens=256,
                         codebook_size=2048, latent_dim=12, transformer="B",
                         scan_layers=args.scan_layers, remat=args.remat)
    model = TiTok(config)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (args.bs, 128, 128, 3), jnp.float32)
    params = jax.jit(model.init)(rng, images[:1])["params"]

    perceptual = None
    if not args.no_perceptual:
        perceptual = PerceptualLoss(PerceptualLoss.init_params(),
                                    dtype=jnp.bfloat16)

    tx = make_optimizer(1e-4, 5000, 1_000_000, 1e-5, 1e-4, clip_norm=1.0)
    state = TrainState.create(params, tx)
    usage = jnp.zeros((config.codebook_size,), jnp.float32)

    step = jax.jit(
        make_tokenizer_train_step(model, perceptual_loss_fn=perceptual,
                                  perceptual_weight=1.0),
        donate_argnums=(0, 2),
    )

    t0 = time.perf_counter()
    lowered = step.lower(state, images, usage, rng)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()

    state, usage, metrics, _ = compiled(state, images, usage, rng)
    float(jax.device_get(metrics["train/loss"]))  # completion barrier
    t3 = time.perf_counter()
    for _ in range(args.steps):
        state, usage, metrics, _ = compiled(state, images, usage, rng)
    loss = float(jax.device_get(metrics["train/loss"]))
    t4 = time.perf_counter()

    print(json.dumps({
        "scan_layers": args.scan_layers,
        "remat": args.remat,
        "lower_s": round(t1 - t0, 2),
        "compile_s": round(t2 - t1, 2),
        "first_step_s": round(t3 - t2, 2),
        "img_per_s": round(args.bs * args.steps / (t4 - t3), 2),
        "loss": round(loss, 5),
    }))


if __name__ == "__main__":
    main()
