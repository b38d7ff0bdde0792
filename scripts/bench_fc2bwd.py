"""Micro-A/B of the round-5 pool table's largest GEMM straggler: the MLP
backward fusion (bf16[3072] db1, bf16[64,320,3072] dh) — 24×0.94 ms/step at
105.5 TF/s vs the 188.5 envelope (benchdata/fusion_table.json). Contents:
dgh = dy·W2ᵀ (GEMM), dh = dgh ⊙ gelu'(h) (VPU: tanh' of the round-5 tanh_erf
gelu), db1 = Σ_{b,s} dh (cross-row reduction). Variants isolate which part
pays:

  full       GEMM + gelu'(h) + dual output (dh, db1)     [in-step form]
  no_db     GEMM + gelu'(h), dh only
  no_gelu   GEMM + db1, derivative stubbed to 1
  erf_gelu  GEMM + EXACT-erf gelu' + db1 (the pre-round-5 form)
  gemm      GEMM + dh write only

Same fori_loop + optimization_barrier methodology as bench_fc1.py.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

B, S, E, F = 64, 320, 768, 3072


def _gelu_grad_tanh_erf(h):
    from vit_tpu.ops.gelu import gelu

    return jax.vmap(jax.vmap(jax.vmap(jax.grad(
        lambda v: gelu(v, "tanh_erf")))))(h)


def make_fn(variant: str, iters: int):
    from vit_tpu.ops.gelu import gelu as gelu_op

    def fc2bwd(dy, w2, h):
        dgh = jnp.einsum("bse,fe->bsf", dy, w2.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        if variant in ("full", "no_db"):
            hf = h.astype(jnp.float32)
            _, vjp = jax.vjp(lambda v: gelu_op(v, "tanh_erf"), hf)
            dh = vjp(dgh)[0].astype(jnp.bfloat16)
        elif variant == "manual":
            # hand-written derivative of the tanh_erf gelu (same math as the
            # vjp arm, one flat expression)
            hf = h.astype(jnp.float32)
            u = jnp.clip(hf * 0.7071067811865476, -4.0, 4.0)
            u2 = u * u
            p = u * (1.12814338 + u2 * (0.10408119 + u2 * -0.00178647))
            t = jnp.tanh(p)
            dp = (1.12814338 + u2 * (3 * 0.10408119 + u2 * (5 * -0.00178647)))
            gp = (0.5 * (1.0 + t)
                  + 0.5 * hf * (1.0 - t * t) * dp * 0.7071067811865476)
            dh = (dgh * gp).astype(jnp.bfloat16)
        elif variant == "bf16_manual":
            # same, computed in bf16 end-to-end (halves the VPU element count)
            u = jnp.clip(h * jnp.bfloat16(0.7071067811865476),
                         jnp.bfloat16(-4.0), jnp.bfloat16(4.0))
            u2 = u * u
            c1, c3, c5 = (jnp.bfloat16(1.12814338), jnp.bfloat16(0.10408119),
                          jnp.bfloat16(-0.00178647))
            p = u * (c1 + u2 * (c3 + u2 * c5))
            t = jnp.tanh(p)
            dp = c1 + u2 * (jnp.bfloat16(3 * 0.10408119)
                            + u2 * jnp.bfloat16(5 * -0.00178647))
            half = jnp.bfloat16(0.5)
            gp = (half * (jnp.bfloat16(1.0) + t)
                  + half * h * (jnp.bfloat16(1.0) - t * t) * dp
                  * jnp.bfloat16(0.7071067811865476))
            dh = (dgh.astype(jnp.bfloat16) * gp)
        elif variant == "erf_gelu":
            hf = h.astype(jnp.float32)
            _, vjp = jax.vjp(lambda v: gelu_op(v, "erf"), hf)
            dh = vjp(dgh)[0].astype(jnp.bfloat16)
        else:
            dh = dgh.astype(jnp.bfloat16)
        if variant in ("full", "no_gelu", "erf_gelu", "manual", "bf16_manual"):
            db = jnp.sum(dh.astype(jnp.float32), axis=(0, 1)).astype(
                jnp.bfloat16)
            return dh, db
        return (dh,)

    @jax.jit
    def loop(dy, w2, h):
        def body(i, carry):
            dy2, acc = carry
            outs = jax.lax.optimization_barrier(fc2bwd(dy2, w2, h))
            probe = outs[0][0, 0, 0].astype(jnp.float32)
            dy2 = dy2.at[0, 0, 0].set(probe.astype(dy2.dtype) * 1e-6)
            return dy2, acc + probe
        _, acc = jax.lax.fori_loop(0, iters, body, (dy, jnp.float32(0)))
        return acc

    return loop


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=100)
    args = parser.parse_args()
    from vit_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)
    dy = jax.random.normal(rng, (B, S, E), jnp.bfloat16)
    w2 = jax.random.normal(rng, (F, E), jnp.float32) * 0.02
    h = jax.random.normal(jax.random.PRNGKey(1), (B, S, F), jnp.bfloat16)

    gemm_gflops = 2 * B * S * E * F / 1e9
    for variant in ("full", "manual", "bf16_manual", "no_db", "no_gelu", "erf_gelu", "gemm"):
        fn = make_fn(variant, args.iters)
        jax.device_get(fn(dy, w2, h))
        t0 = time.perf_counter()
        jax.device_get(fn(dy, w2, h))
        dt = time.perf_counter() - t0
        ms = dt / args.iters * 1e3
        print(f"{variant:9s} {ms:7.3f} ms/call  {gemm_gflops/ms:6.1f} TF/s")


if __name__ == "__main__":
    main()
