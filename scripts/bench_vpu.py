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


def _fma_kernel(x_ref, o_ref, *, iters: int):
    x = x_ref[:]
    c = jnp.float32(1.0000001)
    d = jnp.float32(1e-7)

    def body(_, acc):
        return acc * c + d

    o_ref[:] = jax.lax.fori_loop(0, iters, body, x)


def vpu_fma_rate(shape=(512, 512), iters=4096, steps=20, dtype=jnp.float32):
    x = jnp.ones(shape, dtype)
    fn = jax.jit(pl.pallas_call(
        functools.partial(_fma_kernel, iters=iters),
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
    macs = shape[0] * shape[1] * iters
    return macs / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from vit_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    for dtype in (jnp.float32, jnp.bfloat16):
        rate, dt = vpu_fma_rate(iters=args.iters, steps=args.steps,
                                dtype=dtype)
        print(f"{jnp.dtype(dtype).name:9s} VPU FMA rate: {rate / 1e12:6.2f} "
              f"T MAC/s  ({dt * 1e3:.3f} ms/call)")
    gmacs = 22.0  # flagship dwconv workload (BENCHMARKS.md round-3 section)
    rate32, _ = vpu_fma_rate(iters=args.iters, steps=args.steps)
    print(f"→ dwconv VPU floor at this rate: {gmacs * 1e9 / rate32 * 1e3:.1f} "
          f"ms vs 20.9 ms measured in-step")


if __name__ == "__main__":
    main()
