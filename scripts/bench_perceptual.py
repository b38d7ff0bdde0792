"""Isolated perceptual-loss (ConvNeXt-S fwd×2 + bwd) step timing on TPU.

Measures the exact sub-graph the flagship step pays for the perceptual term:
value_and_grad of ||f(resize(x)) - f(resize(y))||² w.r.t. x, at flagship shapes.
Used to iterate on ConvNeXt layout/kernel changes without recompiling the full
TiTok step. Prints ms/step.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from vit_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--bs", type=int, default=64)
    parser.add_argument("--image_size", type=int, default=128)
    parser.add_argument("--reps", type=int, default=10)
    parser.add_argument("--dw_impl", type=str, default="lax")
    args = parser.parse_args()

    from vit_tpu.losses.perceptual import PerceptualLoss

    loss = PerceptualLoss(PerceptualLoss.init_params(), dtype=jnp.bfloat16,
                          dw_impl=args.dw_impl)
    x = jax.random.uniform(jax.random.PRNGKey(0),
                           (args.bs, args.image_size, args.image_size, 3))
    y = jax.random.uniform(jax.random.PRNGKey(1), x.shape)

    @jax.jit
    def step(x, y):
        def chain(c, _):
            v, g = jax.value_and_grad(lambda xx: loss(xx, y))(c)
            return c + 1e-6 * g, v
        c, vs = jax.lax.scan(chain, x, None, length=args.reps)
        return vs.mean() + c.astype(jnp.float32).mean()

    float(jax.device_get(step(x, y)))
    t0 = time.perf_counter()
    float(jax.device_get(step(x, y)))
    dt = (time.perf_counter() - t0) / args.reps * 1e3
    print(f"perceptual fwd*2+bwd: {dt:.2f} ms/step (bs={args.bs}, "
          f"dw_impl={args.dw_impl})")


if __name__ == "__main__":
    main()
