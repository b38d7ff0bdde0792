"""Micro-A/B of the flagship's single largest fusion: the fc1 forward
(LN-apply read → GEMM(+bias) → GELU epilogue → DUAL (B,S,4E) write of h and
gelu(h)) — 24×1.13 ms = 27.2 ms/step, 83-89 TF/s model rate vs the 176-189
TF/s the neighboring single-output GEMM fusions sustain (round-5 xprof table,
BENCHMARKS.md). dma_stall=0 says the MXU isn't waiting on HBM, so the deficit
is either (a) the exact-erf GELU's VPU serialization or (b) the dual-output
epilogue. This bench isolates the variants:

  full       LN-read GEMM + bias + erf-GELU, outputs (h, gelu(h))   [in-step shape]
  tanh       same but approximate (tanh) GELU
  nogelu     same dual-write but second output = h * 1.0009765625   (VPU-cheap)
  gelu_only  single output gelu(h)  (what an MLP custom_vjp fwd would emit)
  h_only     single output h        (pure LN-read GEMM + bias)

Methodology: fori_loop with optimization_barrier'd outputs and a one-element
carry feedback (serializes iterations, defeats DCE — see BENCHMARKS.md
round-5 "measurement methodology correction" for why dispatch-per-call
benching under-reads by 10x on this tunneled platform and the old 130 TF/s
envelope number was wrong).
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


def make_fn(variant: str, iters: int):
    def fc1(x, mean, rstd, w1, b1):
        xn = ((x.astype(jnp.float32) - mean[..., None]) * rstd[..., None])
        h = jnp.einsum("bse,ef->bsf", xn.astype(jnp.bfloat16),
                       w1.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        h = (h + b1.astype(jnp.float32)).astype(jnp.bfloat16)
        if variant == "full":
            return h, jax.nn.gelu(h, approximate=False)
        if variant == "tanh":
            return h, jax.nn.gelu(h, approximate=True)
        if variant == "tanh_erf":
            # fitted tanh-composed erf (max gelu err 5.4e-5, 70x under bf16
            # resolution): erf(u) ~ tanh(c1 u + c3 u^3 + c5 u^5), u clamped
            hf = h.astype(jnp.float32)
            u = jnp.clip(hf * 0.7071067811865476, -4.0, 4.0)
            u2 = u * u
            p = u * (1.12814338 + u2 * (0.10408119 + u2 * -0.00178647))
            return h, (0.5 * hf * (1.0 + jnp.tanh(p))).astype(h.dtype)
        if variant == "as_erf":
            # Abramowitz-Stegun 7.1.26 (exp + divide), as in kernels/convnext_block
            hf = h.astype(jnp.float32)
            z = jnp.abs(hf * 0.7071067811865476)
            t = 1.0 / (1.0 + 0.3275911 * z)
            poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                        + t * (-1.453152027 + t * 1.061405429))))
            erf = jnp.sign(hf) * (1.0 - poly * jnp.exp(-z * z))
            return h, (0.5 * hf * (1.0 + erf)).astype(h.dtype)
        if variant == "nogelu":
            return h, h * jnp.bfloat16(1.0009765625)
        if variant == "gelu_only":
            return (jax.nn.gelu(h, approximate=False),)
        if variant == "h_only":
            return (h,)
        raise ValueError(variant)

    @jax.jit
    def loop(x, mean, rstd, w1, b1):
        def body(i, carry):
            x2, acc = carry
            outs = jax.lax.optimization_barrier(fc1(x2, mean, rstd, w1, b1))
            probe = outs[-1][0, 0, 0].astype(jnp.float32)
            x2 = x2.at[0, 0, 0].set(probe.astype(x2.dtype) * 1e-6)
            return x2, acc + probe
        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc

    return loop


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=100)
    args = parser.parse_args()
    from vit_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, S, E), jnp.bfloat16)
    mean = jnp.zeros((B, S), jnp.float32)
    rstd = jnp.ones((B, S), jnp.float32)
    w1 = jax.random.normal(rng, (E, F), jnp.float32) * 0.02
    b1 = jnp.zeros((F,), jnp.float32)

    gemm_gflops = 2 * B * S * E * F / 1e9
    for variant in ("full", "tanh", "tanh_erf", "as_erf", "nogelu", "gelu_only", "h_only"):
        fn = make_fn(variant, args.iters)
        jax.device_get(fn(x, mean, rstd, w1, b1))  # compile + warm
        t0 = time.perf_counter()
        jax.device_get(fn(x, mean, rstd, w1, b1))
        dt = time.perf_counter() - t0
        ms = dt / args.iters * 1e3
        nout = 1 if variant in ("gelu_only", "h_only") else 2
        wbytes = nout * B * S * F * 2
        rbytes = B * S * E * 2 + E * F * 4
        print(f"{variant:10s} {ms:7.3f} ms/call  {gemm_gflops/ms:6.1f} TF/s  "
              f"{(wbytes + rbytes)/ms/1e6:6.1f} GB/s stream")


if __name__ == "__main__":
    main()
