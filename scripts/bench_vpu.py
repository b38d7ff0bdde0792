"""Measure this chip's VPU compute envelope (fp32 FMA/s), to bound the
depthwise-conv pool correctly.

Why: the 7×7 depthwise convs in the perceptual ConvNeXt cost 49 MACs per
element — VECTOR work the MXU can't take (no channel mixing). Whether the
measured 20.9 ms/step is a bandwidth pool (fixable by a better schedule) or
the VPU compute floor (not fixable) depends on the VPU's real MAC rate:
the flagship dwconv workload is ~22 GMAC/step (see BENCHMARKS.md), so a
1 T MAC/s VPU makes 22 ms the floor, while 4 T MAC/s would leave ~15 ms on
the table. This kernel keeps a block VMEM-resident and chains in-register
FMAs so arithmetic, not HBM, is the limiter.

    python scripts/bench_vpu.py [--iters 4096] [--steps 20]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fma_kernel(x_ref, o_ref, *, iters: int, chains: int):
    """`chains` independent FMA streams per element expose the VPU's ALU
    parallelism; a single dependent chain measures FMA *latency* instead
    (first run of this script: 0.29 T MAC/s chain-bound vs the dwconv's own
    in-step rate — clearly not the issue rate)."""
    x = x_ref[:]
    c = jnp.asarray(1.0000001, x.dtype)
    d = jnp.asarray(1e-7, x.dtype)

    def body(_, accs):
        return tuple(a * c + d for a in accs)

    accs = jax.lax.fori_loop(
        0, iters, body,
        tuple(x + jnp.asarray(i, x.dtype) for i in range(chains)))
    out = accs[0]
    for a in accs[1:]:
        out = out + a
    o_ref[:] = out


def vpu_fma_rate(shape=(64, 128), iters=65536, steps=20, dtype=jnp.float32,
                 chains=1):
    """Block must fit the vector register file (with chains copies), or the
    fori_loop carry round-trips VMEM each iteration and the measurement
    becomes VMEM bandwidth (~1.4 TB/s observed with a 512 KB block), not the
    ALU issue rate. (64,128) fp32 = 8 vregs per chain."""
    x = jnp.ones(shape, dtype)
    fn = jax.jit(pl.pallas_call(
        functools.partial(_fma_kernel, iters=iters, chains=chains),
        in_specs=[pl.BlockSpec(shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        interpret=jax.default_backend() != "tpu",
    ))
    out = fn(x)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(out)
    jax.device_get(out.ravel()[0])
    dt = (time.perf_counter() - t0) / steps
    macs = shape[0] * shape[1] * iters * chains
    return macs / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from vit_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    best32 = 0.0
    for dtype in (jnp.float32, jnp.bfloat16):
        for chains in (1, 2, 3, 4, 5, 6):
            rate, dt = vpu_fma_rate(iters=args.iters, steps=args.steps,
                                    dtype=dtype, chains=chains)
            if dtype == jnp.float32:
                best32 = max(best32, rate)
            print(f"{jnp.dtype(dtype).name:9s} chains={chains}  VPU FMA rate: "
                  f"{rate / 1e12:6.2f} T MAC/s  ({dt * 1e3:.3f} ms/call)")
    gmacs = 22.0  # flagship dwconv workload (BENCHMARKS.md round-3 section)
    print(f"→ dwconv VPU floor at best fp32 rate: "
          f"{gmacs * 1e9 / best32 * 1e3:.1f} ms vs 20.9 ms measured in-step")


if __name__ == "__main__":
    main()
