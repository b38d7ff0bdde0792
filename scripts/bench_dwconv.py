"""Micro-benchmark: 7x7 depthwise conv at the ConvNeXt-S stage shapes of the
flagship perceptual loss (224-px input, bs 64).

Compares XLA's grouped conv_general_dilated against the Pallas kernel
(kernels/depthwise.py) — forward and forward+backward — at each stage shape,
using the fori_loop one-element-carry chaining harness (see
scripts/bench_attention.py) so the ~1.2 ms dispatch round-trip and jit-boundary
layout copies don't swamp sub-ms ops.

Profile context (round 3, /tmp/r3stats): in the flagship step the XLA grouped
conv self-times 20.9 ms and forces {3,0,2,1}<->{3,2,1,0} layout copies (8.2 ms
"data formatting") at its boundaries with the Pallas block-tail custom-calls,
which pin default layouts.

Usage: python scripts/bench_dwconv.py [--impl lax|pallas|both] [--steps 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

# (B, H, W, C, n_blocks) per ConvNeXt-S stage at 224 input
STAGES = [
    (64, 56, 56, 96, 3),
    (64, 28, 28, 192, 3),
    (64, 14, 14, 384, 27),
    (64, 7, 7, 768, 3),
]
CHAIN = 16


def lax_dw(x, w, b):
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x, w.reshape(7, 7, 1, c), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    return out + b


def timeit(fn, args, steps, label, gbytes):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])  # completion barrier
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / steps / CHAIN
    print(f"{label:34s} {dt * 1e3:8.3f} ms/call  {gbytes / dt / 1e9:7.1f} GB/s")
    return dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="both")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from vit_tpu.kernels.depthwise import depthwise_conv
    from vit_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    impls = {"lax": lax_dw,
             "pallas": lambda x, w, b: depthwise_conv(x, w, b, 7)}
    if args.impl != "both":
        impls = {args.impl: impls[args.impl]}

    tot = {k: [0.0, 0.0] for k in impls}
    for (b_, h, w_, c, nblk) in STAGES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b_, h, w_, c), jnp.bfloat16)
        w = jax.random.normal(key, (7, 7, c), jnp.bfloat16)
        bias = jnp.zeros((c,), jnp.bfloat16)
        nbytes = b_ * h * w_ * c * 2
        for name, fn in impls.items():

            @jax.jit
            def fwd_chain(x, w, bias, fn=fn):
                def body(_, x):
                    o = fn(x, w, bias)
                    return x.at[0, 0, 0, 0].set(
                        o[0, 0, 0, 0] * 1e-24 + x[0, 0, 0, 0])
                return jax.lax.fori_loop(0, CHAIN, body, x)

            def loss(x, w, bias, fn=fn):
                return jnp.sum(fn(x, w, bias).astype(jnp.float32) ** 2)

            grad = jax.grad(loss, argnums=(0, 1, 2))

            @jax.jit
            def fb_chain(x, w, bias, grad=grad):
                def body(_, x):
                    dx, dw, db = grad(x, w, bias)
                    return x.at[0, 0, 0, 0].set(
                        dx[0, 0, 0, 0] * 1e-24 + dw[0, 0, 0] * 1e-24
                        + x[0, 0, 0, 0])
                return jax.lax.fori_loop(0, CHAIN, body, x)

            fwd = timeit(fwd_chain, (x, w, bias), args.steps,
                         f"{name} fwd {h}x{w_}x{c}", 2 * nbytes)
            fb = timeit(fb_chain, (x, w, bias), args.steps,
                        f"{name} fwd+bwd {h}x{w_}x{c}", 5 * nbytes)
            tot[name][0] += fwd * nblk
            tot[name][1] += fb * nblk
    for name, (f, fb) in tot.items():
        print(f"TOTAL {name}: fwd {f:.2f} ms, fwd+bwd {fb:.2f} ms; flagship "
              f"dwconv ~= fwd + fwd+bwd = {f + fb:.2f} ms (y branch fwd-only, "
              f"x branch fwd+bwd)")


if __name__ == "__main__":
    main()
