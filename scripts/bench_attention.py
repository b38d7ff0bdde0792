"""Isolated micro-benchmark for the Pallas packed attention kernels.

Times fwd / bwd at the flagship TiTok-B shape (B=64, H=12, S=320, D=64) and
prints ms/call + effective TF/s (useful-FLOP convention: fwd 4·B·H·S²·D,
bwd 10·B·H·S²·D). Used to drive kernel iterations without paying the full
flagship-step compile each time.

    python scripts/bench_attention.py [--bs 64] [--seq 320] [--steps 50]
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
    jax.device_get(jax.tree.leaves(out)[0][0, 0])  # completion barrier
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0][0, 0])
    dt = (time.perf_counter() - t0) / steps
    print(f"{label:28s} {dt * 1e3:8.3f} ms/call   {flops / dt / 1e12:6.1f} TF/s")
    return dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bs", type=int, default=64)
    parser.add_argument("--heads", type=int, default=12)
    parser.add_argument("--seq", type=int, default=320)
    parser.add_argument("--head_dim", type=int, default=64)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--dropout", type=float, default=0.0)
    args = parser.parse_args()

    from vit_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from vit_tpu.kernels.attention import flash_attention_packed

    b, h, s, d = args.bs, args.heads, args.seq, args.head_dim
    n_embd = h * d
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (b, s, 3 * n_embd), jnp.bfloat16)
    seed = jnp.zeros((), jnp.int32)

    fwd_flops = 4 * b * h * s * s * d
    bwd_flops = 10 * b * h * s * s * d

    # fori_loop with a one-element in-place carry: forces serialization without
    # paying a full-buffer copy per step (donated carry, dynamic-update-slice).
    CHAIN = 32

    from vit_tpu.kernels.attention import _packed_bwd_cp, _packed_fwd_cp

    fwd_call = _packed_fwd_cp(h, False, args.dropout, True)
    bwd_call = _packed_bwd_cp(h, False, args.dropout, True)
    bias = jax.random.normal(jax.random.PRNGKey(2), (3 * n_embd,),
                             jnp.bfloat16) * 0.1

    @jax.jit
    def fwd_chain(x):
        def body(_, x):
            o = fwd_call(x, bias, seed)
            return x.at[0, 0, 0].set(o[0, 0, 0] * 1e-24 + x[0, 0, 0])
        return jax.lax.fori_loop(0, CHAIN, body, x)

    @jax.jit
    def bwd_chain(x, g):
        def body(_, x):
            dqkv, db = bwd_call(x, g, bias, seed)
            bump = (dqkv[0, 0, 0].astype(jnp.float32) * 1e-24
                    + db[0].astype(jnp.float32) * 1e-24
                    + x[0, 0, 0].astype(jnp.float32))
            return x.at[0, 0, 0].set(bump.astype(x.dtype))
        return jax.lax.fori_loop(0, CHAIN, body, x)

    g = jax.random.normal(jax.random.PRNGKey(1), (b, s, n_embd), jnp.bfloat16)
    timeit(fwd_chain, (qkv,), args.steps, "packed fwd", CHAIN * fwd_flops)
    timeit(bwd_chain, (qkv, g), args.steps, "packed bwd", CHAIN * bwd_flops)

    # (m, l)-residual arms (round 5): fwd also emits the softmax row stats;
    # bwd consumes them and skips its (Sp,Sp) max/sum recompute.
    from vit_tpu.kernels.attention import _stats_enabled

    if _stats_enabled(s):
        fwd_stats = _packed_fwd_cp(h, False, args.dropout, True, True)
        bwd_stats = _packed_bwd_cp(h, False, args.dropout, True, True)

        @jax.jit
        def fwd_stats_chain(x):
            def body(_, x):
                o, st = fwd_stats(x, bias, seed)
                bump = (o[0, 0, 0].astype(jnp.float32) * 1e-24
                        + st[0, 0, 0, 0] * 1e-24
                        + x[0, 0, 0].astype(jnp.float32))
                return x.at[0, 0, 0].set(bump.astype(x.dtype))
            return jax.lax.fori_loop(0, CHAIN, body, x)

        @jax.jit
        def bwd_stats_chain(x, g):
            _, stats = fwd_stats(x, bias, seed)

            def body(_, x):
                dqkv, db = bwd_stats(x, g, bias, seed, stats)
                bump = (dqkv[0, 0, 0].astype(jnp.float32) * 1e-24
                        + db[0].astype(jnp.float32) * 1e-24
                        + x[0, 0, 0].astype(jnp.float32))
                return x.at[0, 0, 0].set(bump.astype(x.dtype))
            return jax.lax.fori_loop(0, CHAIN, body, x)

        timeit(fwd_stats_chain, (qkv,), args.steps, "packed fwd+stats",
               CHAIN * fwd_flops)
        timeit(bwd_stats_chain, (qkv, g), args.steps, "packed bwd(stats)",
               CHAIN * bwd_flops)

if __name__ == "__main__":
    main()
