"""Full VideoGPT-B AR-prior training step at the reference default context.

Reference train_videogpt.py:26-27 defaults to 16 frames x 64 tokens = 1024-token
sequences. This times the complete train step (fwd + bwd + AdamW) with the
q-block-tiled Pallas attention backward vs the XLA rematerialized fallback:

    python scripts/bench_videogpt_step.py                       # tiled (default)
    VIT_TPU_TILED_BWD=0 python scripts/bench_videogpt_step.py   # XLA remat

Measured (TPU v5e, round 3): tiled 251.2 ms (130,430 tok/s) vs remat 383.5 ms
(85,444 tok/s) — the tiled backward wins the whole step by 1.53x.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vit_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from vit_tpu.models.videogpt import VideoGPT, VideoGPTConfig
from vit_tpu.train.optim import make_optimizer
from vit_tpu.train.state import TrainState


def main():
    cfg = VideoGPTConfig(64, 1024, "B", 16, 0.0, dtype=jnp.bfloat16)  # S = 16*64
    model = VideoGPT(cfg)
    rng = jax.random.PRNGKey(0)
    tokens = jax.random.randint(rng, (32, 16, 64), 0, 1024, jnp.int32)
    params = jax.jit(model.init)(rng, tokens[:1])["params"]
    tx = make_optimizer(1e-4, 10, 1000, 1e-5, 1e-4)
    state = TrainState.create(params, tx)

    @jax.jit
    def step(state, tokens):
        def loss_fn(p):
            _, loss = model.apply({"params": p}, tokens)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    state, loss = step(state, tokens)
    float(jax.device_get(loss))  # completion barrier (not block_until_ready)
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        state, loss = step(state, tokens)
    float(jax.device_get(loss))
    dt = (time.perf_counter() - t0) / n
    print(f"tiled={os.environ.get('VIT_TPU_TILED_BWD', '1')} "
          f"step={dt * 1e3:.1f} ms  tokens/s={32 * 1024 / dt:,.0f}")


if __name__ == "__main__":
    main()
