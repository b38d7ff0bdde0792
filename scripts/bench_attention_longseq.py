"""Long-sequence attention micro-bench: tiled Pallas backward vs XLA remat.

The VideoGPT default context is 16 frames x 64 tokens = 1024 (reference
train_videogpt.py:26-27), beyond the single-program fused backward's VMEM bound
(S <= 768). This times, at the VideoGPT shape (B=32, H=12, S=1024, D=64, bf16,
causal), value-and-grad through:

  (a) flash_attention  — Pallas forward + q-block-TILED Pallas backward
      (per-program dk/dv partials reduced by XLA; kernels/attention.py),
  (b) attention_xla    — the XLA path the old fallback rematerialized.

    python scripts/bench_attention_longseq.py [--bs 32] [--seq 1024]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timeit(fn, args, steps, label, flops):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])  # completion barrier
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / steps
    print(f"{label:36s} {dt * 1e3:8.3f} ms/call   {flops / dt / 1e12:6.1f} TF/s")
    return dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bs", type=int, default=32)
    parser.add_argument("--heads", type=int, default=12)
    parser.add_argument("--seq", type=int, default=1024)
    parser.add_argument("--head_dim", type=int, default=64)
    parser.add_argument("--steps", type=int, default=30)
    args = parser.parse_args()

    from vit_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from vit_tpu.kernels.attention import flash_attention
    from vit_tpu.ops.attention import attention_xla

    b, h, s, d = args.bs, args.heads, args.seq, args.head_dim
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.bfloat16) for kk in ks)

    fwd_flops = 4 * b * h * s * s * d
    vg_flops = fwd_flops + 10 * b * h * s * s * d

    def make_vg(att):
        def loss(q, k, v):
            return jnp.sum(att(q, k, v, causal=True).astype(jnp.float32) ** 2)

        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))

    fwd_pallas = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))
    fwd_xla = jax.jit(lambda q, k, v: attention_xla(q, k, v, causal=True))

    timeit(fwd_pallas, (q, k, v), args.steps, "fwd pallas", fwd_flops)
    timeit(fwd_xla, (q, k, v), args.steps, "fwd xla", fwd_flops)
    timeit(make_vg(flash_attention), (q, k, v), args.steps,
           "fwd+bwd pallas (tiled bwd)", vg_flops)
    timeit(make_vg(attention_xla), (q, k, v), args.steps,
           "fwd+bwd xla (remat-equivalent)", vg_flops)


if __name__ == "__main__":
    main()
