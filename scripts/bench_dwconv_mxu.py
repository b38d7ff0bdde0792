"""Depthwise-conv-on-the-MXU attack (VERDICT r3 next #2): measure every
im2col-style MXU formulation of the perceptual net's 7×7 depthwise convs
against the lax grouped-conv baseline, at the real flagship stage shapes.

Why this is expected to be hard (the arithmetic, written down so the ledger
closes honestly either way): a depthwise conv has NO channel mixing — per
output element it is 49 MACs on ONE channel. The MXU contracts along a
128-lane dimension; mapping a diagonal (per-channel) operator onto it forces
one of:

  a) batched matmul, batch=C, M=rows, K=49, N=1   → 1 of 128 output lanes
     used → ≤ peak/128 ≈ 0.5 T MAC/s useful: no better than the VPU.
  b) block-diagonal dense expansion (im2col K=49·C against a (49C, C) weight
     with k·δ(ci,co) structure) → full MXU rate but C× wasted FLOPs:
     useful rate ≈ 65/C T MAC/s → 0.68 (C=96) … 0.08 (C=768): loses.
  c) grouped variants (g channels per block, K=49g, N=g) interpolate between
     a) and b): utilization×waste is ~constant ≈ bad.

The VPU already sustains ~1.05 T MAC/s on this op (scripts/bench_vpu.py
measured the FMA issue envelope at 0.78-0.80 T MAC/s — XLA's emitter is at
the ALU floor, BENCHMARKS.md round-3 close-out). The MXU formulations must
beat 20.9 ms/step in-context to matter; the predictions above say none can.
This script MEASURES (b) and (c) anyway so the CLOSED verdict covers the
im2col/MXU attack with numbers, not arithmetic alone.

    python scripts/bench_dwconv_mxu.py [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

# flagship perceptual stage shapes (bs 64 → 128 images of 224² through the
# ConvNeXt-S trunk: stage resolutions 56/28/14/7, dims 96/192/384/768), with
# per-stage block counts (3, 3, 27, 3)
STAGES = [
    (128, 56, 96, 3),
    (128, 28, 192, 3),
    (128, 14, 384, 27),
    (128, 7, 768, 3),
]


def _time_chained(fn, x, k, iters=20):
    """fori-loop-chained timing: output feeds the next input, stripping the
    ~1.2 ms per-dispatch floor that swamps sub-ms ops in the loop above
    (scripts/bench_dwconv.py round-3 methodology)."""

    @jax.jit
    def run(x, k):
        # cast back to the input dtype so formulations that accumulate in f32
        # (im2col_batched) still chain without changing the timed op
        return jax.lax.fori_loop(
            0, iters, lambda i, xx: fn(xx, k).astype(x.dtype), x)

    out = run(x, k)
    jax.device_get(jnp.sum(out))
    t0 = time.perf_counter()
    out = run(x, k)
    jax.device_get(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def dw_lax(x, k):
    """Baseline: XLA grouped conv (the production path, DWConv7)."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, k[..., None, :], (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def dw_blockdiag(x, k, g: int):
    """(c) grouped block-diagonal dense conv: groups of g channels run as a
    DENSE conv over g in/out channels with a k·δ diagonal kernel — K=49·g
    contraction on the MXU, g× wasted FLOPs. g == C degenerates to (b)."""
    n, h, w, c = x.shape
    assert c % g == 0
    kr = k.reshape(7, 7, c // g, g)                      # (7,7,G,g)
    eye = jnp.eye(g, dtype=k.dtype)
    kd = kr[..., :, None] * eye[None, None, None]        # (7,7,G,g_in,g_out)
    kd = kd.transpose(0, 1, 3, 2, 4).reshape(7, 7, g, c)  # HWIO, group-major O
    return jax.lax.conv_general_dilated(
        x, kd, (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c // g)


def dw_im2col_batched(x, k):
    """(a) explicit im2col + batched matmul: batch=C, M=N·H·W, K=49, N=1.
    Materializes the 49× patch tensor (the im2col cost is charged to the
    formulation, as it must be)."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    pats = [xp[:, dy:dy + h, dx:dx + w, :] for dy in range(7)
            for dx in range(7)]
    p = jnp.stack(pats, axis=-1)                     # (N,H,W,C,49)
    p = p.transpose(3, 0, 1, 2, 4).reshape(c, n * h * w, 49)
    kk = k.reshape(49, c).T[:, :, None]              # (C,49,1)
    out = jax.lax.dot_general(p, kk, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    return out.reshape(c, n, h, w).transpose(1, 2, 3, 0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    args = parser.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    total = {}
    for (n, hw, c, blocks) in STAGES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(n, hw, hw, c)), dt)
        k = jnp.asarray(rng.normal(size=(7, 7, c)), dt)
        macs = n * hw * hw * c * 49

        row = {"lax": _time_chained(dw_lax, x, k, iters=args.iters)}
        for g in (8, 32, min(128, c)):
            if c % g == 0:
                f = functools.partial(dw_blockdiag, g=g)
                try:
                    row[f"blockdiag_g{g}"] = _time_chained(
                        f, x, k, iters=args.iters)
                except Exception as e:
                    row[f"blockdiag_g{g}"] = f"ERR {type(e).__name__}"
        try:
            row["im2col_batched"] = _time_chained(dw_im2col_batched, x, k,
                                                  iters=args.iters)
        except Exception as e:
            row["im2col_batched"] = f"ERR {type(e).__name__}"

        print(f"stage N={n} HW={hw} C={c} (×{blocks} blocks/steps "
              f"{macs/1e9:.2f} GMAC):")
        for name, t in row.items():
            if isinstance(t, str):
                print(f"  {name:18s} {t}")
                continue
            print(f"  {name:18s} {t*1e3:8.3f} ms  "
                  f"{macs/t/1e12:6.2f} T MAC/s  "
                  f"(×{blocks} = {t*1e3*blocks:7.2f} ms/fwd-pass)")
            total.setdefault(name, 0.0)
            total[name] = total[name] + t * blocks
        print()
    print("fwd-pass totals (one perceptual fwd; step ≈ 3× for x,y fwd + "
          "recon bwd):")
    for name, t in sorted(total.items(), key=lambda kv: kv[1]):
        print(f"  {name:18s} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
