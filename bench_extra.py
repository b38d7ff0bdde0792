"""Secondary north-star benchmarks (BASELINE.json metric): ViT-B supervised-training
images/sec/chip and TiTok enc+dec (tokenizer inference) tokens/sec. The headline
driver benchmark stays in bench.py (TiTok-B training throughput).

Prints one JSON line per metric. Timing uses device_get as the completion barrier
(block_until_ready acks dispatch early on this platform).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _timed(step_fn, fetch, n):
    fetch(step_fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = step_fn()
    fetch(out)
    return (time.perf_counter() - t0) / n


def bench_vit(bs: int, steps: int):
    """ViT-B/16 @224 supervised classification training step."""
    from vit_tpu.models.vit import ViTClassifier, ViTConfig
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState
    from vit_tpu.train.step import make_classifier_train_step

    cfg = ViTConfig(224, 3, 16, "B", 1, 0.0)
    model = ViTClassifier(cfg, num_classes=1000)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (bs, 224, 224, 3), jnp.float32)
    labels = jax.random.randint(rng, (bs,), 0, 1000)
    params = jax.jit(model.init)(rng, images[:1])["params"]
    tx = make_optimizer(1e-4, 5000, 500000, 1e-5, 1e-2, clip_norm=None)
    state = TrainState.create(params, tx)
    step = jax.jit(make_classifier_train_step(model), donate_argnums=(0,))

    holder = {"state": state}

    def one():
        holder["state"], metrics = step(holder["state"], images, labels, rng)
        return metrics

    dt = _timed(one, lambda m: float(jax.device_get(m["train/loss"])), steps)
    print(json.dumps({"metric": "vit_b16_224_train_images_per_sec_per_chip",
                      "value": round(bs / dt, 2), "unit": "images/sec/chip"}))


def bench_titok_tokens(bs: int, steps: int):
    """TiTok-B enc+dec inference: tokens/sec (256 latent tokens per image)."""
    from vit_tpu.models.titok import TiTok, TiTokConfig

    cfg = TiTokConfig(128, 16, 256, 2048, 12, "B")
    model = TiTok(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (bs, 128, 128, 3), jnp.float32)
    params = jax.jit(model.init)(rng, images[:1])["params"]

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))

    def one():
        return fwd(params, images)

    dt = _timed(one, lambda out: float(jax.device_get(out[2])), steps)
    tokens_per_sec = bs * cfg.latent_tokens / dt
    print(json.dumps({"metric": "titok_b_encdec_tokens_per_sec",
                      "value": round(tokens_per_sec, 1), "unit": "tokens/sec",
                      "images_per_sec": round(bs / dt, 1)}))


def bench_vit_l(bs: int, steps: int):
    """ViT-L/16 @256, dropout 0.15 — the reference train_vit.py DEFAULT config."""
    from vit_tpu.models.vit import ViTClassifier, ViTConfig
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState
    from vit_tpu.train.step import make_classifier_train_step

    cfg = ViTConfig(256, 3, 16, "L", 1, 0.15)
    model = ViTClassifier(cfg, num_classes=1000)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (bs, 256, 256, 3), jnp.float32)
    labels = jax.random.randint(rng, (bs,), 0, 1000)
    params = jax.jit(model.init)(rng, images[:1])["params"]
    tx = make_optimizer(1e-4, 5000, 500000, 1e-5, 1e-2, clip_norm=None)
    state = TrainState.create(params, tx)
    step = jax.jit(make_classifier_train_step(model), donate_argnums=(0,))
    holder = {"state": state}

    def one():
        holder["state"], metrics = step(holder["state"], images, labels, rng)
        return metrics

    dt = _timed(one, lambda m: float(jax.device_get(m["train/loss"])), steps)
    print(json.dumps({
        "metric": "vit_l16_256_drop0.15_train_images_per_sec_per_chip",
        "value": round(bs / dt, 2), "unit": "images/sec/chip"}))


def bench_videogpt_rollout(steps: int, quantize: "str | None" = None):
    """VideoGPT-B greedy rollout: 512 generated tokens on 512 conditioning
    tokens (KV-cache decode + one-forward prefill). ``quantize="int8"`` runs
    the int8 twin (core/quant.py) — bs=1 decode is weight-stream-bound, the
    regime where the 4x-lighter int8 weights pay off most."""
    from vit_tpu.models.videogpt import VideoGPT, VideoGPTConfig, generate

    cfg = VideoGPTConfig(64, 1024, "B", 16, 0.0)
    model = VideoGPT(cfg)
    rng = jax.random.PRNGKey(0)
    cond = jax.random.randint(rng, (1, 512), 0, cfg.codebook_size)
    params = jax.jit(model.init)(
        rng, jnp.zeros((1, 2, cfg.frame_size), jnp.int32))["params"]

    if quantize == "int8":
        import dataclasses

        from vit_tpu.core.quant import quantize_params

        cfg_q = dataclasses.replace(cfg, quant="int8")
        model = VideoGPT(cfg_q)
        target = jax.eval_shape(model.init, rng,
                                jnp.zeros((1, 2, cfg.frame_size),
                                          jnp.int32))["params"]
        params = quantize_params(target, params)

    def one():
        return generate(model, params, cond, 512)

    dt = _timed(one, lambda out: int(jax.device_get(out[0, -1])), steps)
    q = {"quantize": quantize} if quantize else {}
    print(json.dumps({"metric": "videogpt_b_rollout_tokens_per_sec",
                      "value": round(512 / dt, 1), "unit": "tokens/sec",
                      "conditioning_tokens": 512, **q}))


def main():
    from vit_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--bs", type=int, default=64)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--only", type=str, default=None,
                        choices=[None, "vit", "titok", "vitl", "videogpt"])
    parser.add_argument("--quantize", type=str, default=None,
                        choices=[None, "int8"],
                        help="videogpt rollout only: run the int8 twin")
    args = parser.parse_args()
    if args.only in (None, "vit"):
        bench_vit(args.bs, args.steps)
    if args.only in (None, "titok"):
        bench_titok_tokens(args.bs, args.steps)
    if args.only in (None, "vitl"):
        bench_vit_l(args.bs, args.steps)
    if args.only in (None, "videogpt"):
        bench_videogpt_rollout(max(3, args.steps // 3),
                               quantize=args.quantize)


if __name__ == "__main__":
    main()
