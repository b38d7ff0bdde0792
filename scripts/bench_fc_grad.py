"""Isolated micro-benchmark for the fused dW+db linear backward
(kernels/fc_grad.py) vs XLA's separate dW matmul + db column-sum.

Times the flagship TiTok-B MLP backward shapes (N = 64·320 tokens, C = 768):
fc1 dW (768, 3072) + db(3072), fc2 via the transposed form. The question the
numbers answer: does the Pallas dW matmul reach XLA's dW speed, so the db
column-sum pass (~0.3 ms/site · 48 sites on the flagship step) comes free?

    python scripts/bench_fc_grad.py [--n 20480] [--c 768] [--steps 30]
    VIT_TPU_FC_GRAD_T=explicit python scripts/bench_fc_grad.py   # lhs-T A/B
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
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / steps
    print(f"{label:34s} {dt * 1e3:8.3f} ms/call  {flops / dt / 1e12:6.1f} TF/s")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64 * 320)
    ap.add_argument("--c", type=int, default=768)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    from vit_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from vit_tpu.kernels.fc_grad import matmul_dw_db

    n, c, k = args.n, args.c, 4 * args.c
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, c), jnp.bfloat16)        # fc1 input
    g1 = jax.random.normal(key, (n, k), jnp.bfloat16)       # fc1 upstream grad
    h = jax.random.normal(key, (n, k), jnp.bfloat16)        # fc2 input
    g2 = jax.random.normal(key, (n, c), jnp.bfloat16)       # fc2 upstream grad
    flops = 2 * n * c * k

    # --- XLA oracles ---------------------------------------------------------
    @jax.jit
    def xla_fc1(x, g):
        dw = jax.lax.dot_general(x, g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return dw, g.astype(jnp.float32).sum(0)

    @jax.jit
    def xla_fc1_dw_only(x, g):
        return jax.lax.dot_general(x, g, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @jax.jit
    def xla_fc2(h, g):
        dw = jax.lax.dot_general(h, g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return dw, g.astype(jnp.float32).sum(0)

    # --- fused kernels -------------------------------------------------------
    @jax.jit
    def fused_fc1(x, g):
        return matmul_dw_db(x, g, db_operand=1)

    @jax.jit
    def fused_fc2(h, g):
        dwt, db = matmul_dw_db(g, h, db_operand=0)
        return dwt.T, db

    print(f"N={n} C={c} K={k}  ({flops / 1e9:.1f} GFLOP per dW)")
    t_dw = timeit(xla_fc1_dw_only, (x, g1), args.steps, "xla fc1 dW only", flops)
    t_ref1 = timeit(xla_fc1, (x, g1), args.steps, "xla fc1 dW + db", flops)
    t_f1 = timeit(fused_fc1, (x, g1), args.steps, "pallas fused fc1 dW+db", flops)
    t_ref2 = timeit(xla_fc2, (h, g2), args.steps, "xla fc2 dW + db", flops)
    t_f2 = timeit(fused_fc2, (h, g2), args.steps, "pallas fused fc2 dWt+db (+T)",
                  flops)
    db_pass = t_ref1 - t_dw
    print(f"\nxla db column-sum pass: {db_pass * 1e3:.3f} ms")
    print(f"fc1 fused vs xla(dW+db): {(t_ref1 - t_f1) * 1e3:+.3f} ms/site")
    print(f"fc2 fused vs xla(dW+db): {(t_ref2 - t_f2) * 1e3:+.3f} ms/site")
    sites = 24  # 24 transformer blocks on the flagship (enc 12 + dec 12)
    print(f"projected flagship step delta: "
          f"{((t_ref1 - t_f1) + (t_ref2 - t_f2)) * sites * 1e3:+.2f} ms")


if __name__ == "__main__":
    main()
