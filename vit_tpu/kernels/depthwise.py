"""Pallas 7×7 depthwise convolution (ConvNeXt's spatial mixer).

XLA's grouped ``conv_general_dilated`` with feature_group_count == channels reaches
only ~29 GB/s effective on this part (profile: ~35 ms/step of the flagship's
perceptual term). This kernel holds a whole (H+6, W+6, C) halo-padded image slab in
VMEM and performs the 49 shifted multiply-accumulates on the VPU — HBM traffic drops
to one read + one write of the tensor.

Forward-only with a custom VJP:
  dx = depthwise(dout, spatially-flipped weights)       (same kernel)
  dw, db = jnp reductions (cheap: 49·C and C outputs)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(x_ref, w_ref, b_ref, o_ref, pad_ref, *, ksize: int):
    """x (1, H, W, C), w (ksize, ksize, C), b (C,) → o (1, H, W, C).
    pad_ref: VMEM scratch (H+2p, W+2p, C)."""
    p = ksize // 2
    h = x_ref.shape[1]
    w = x_ref.shape[2]
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[p:p + h, p:p + w, :] = x_ref[0].astype(pad_ref.dtype)
    acc = jnp.broadcast_to(b_ref[...].astype(jnp.float32),
                           (h, w, x_ref.shape[3])).astype(jnp.float32)
    for di in range(ksize):
        for dj in range(ksize):
            acc = acc + pad_ref[di:di + h, dj:dj + w, :] * w_ref[di, dj, :]
    o_ref[0] = acc.astype(o_ref.dtype)


def _dw_forward(x, w, b, *, ksize: int):
    n, h, wdt, c = x.shape
    p = ksize // 2
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_dw_kernel, ksize=ksize),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ksize, ksize, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2 * p, wdt + 2 * p, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wdt * c * ksize * ksize,
            bytes_accessed=2 * n * h * wdt * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def depthwise_conv(x, w, b, ksize: int = 7):
    """SAME-padded depthwise conv. x (N,H,W,C), w (k,k,C), b (C,) → (N,H,W,C)."""
    return _dw_forward(x, w, b, ksize=ksize)


def _dw_fwd(x, w, b, ksize):
    return _dw_forward(x, w, b, ksize=ksize), (x, w)


def _dw_bwd_kernel(x_ref, g_ref, wf_ref, dx_ref, dw_ref, db_ref, padg_ref,
                   padx_ref, *, ksize: int):
    """Fused backward, one image per sequential grid step.

    dx via the flipped filter (same 49-MAC loop as the forward, over padded g);
    dw/db accumulated IN VMEM across the batch grid (dw_ref/db_ref blocks are
    revisited: constant index map → Mosaic keeps them resident and writes back
    once). Round-1's jnp dw reduction did 49 shifted full-tensor HBM passes —
    that was the measured net-loss; here x and g are each read from HBM once."""
    p = ksize // 2
    h = x_ref.shape[1]
    w = x_ref.shape[2]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    padg_ref[...] = jnp.zeros_like(padg_ref)
    padg_ref[p:p + h, p:p + w, :] = g_ref[0].astype(padg_ref.dtype)
    padx_ref[...] = jnp.zeros_like(padx_ref)
    padx_ref[p:p + h, p:p + w, :] = x_ref[0].astype(padx_ref.dtype)

    g32 = g_ref[0].astype(jnp.float32)
    acc = jnp.zeros((h, w, x_ref.shape[3]), jnp.float32)
    # Build this image's (k, k, C) weight grad by concatenation (Mosaic has no
    # scatter-add; static concat of (1,1,C) row sums lowers cleanly), then add
    # once into the resident accumulator block.
    rows = []
    for di in range(ksize):
        cols = []
        for dj in range(ksize):
            acc = acc + padg_ref[di:di + h, dj:dj + w, :] * wf_ref[di, dj, :]
            cols.append(jnp.sum(padx_ref[di:di + h, dj:dj + w, :] * g32,
                                axis=(0, 1))[None, None, :])
        rows.append(jnp.concatenate(cols, axis=1))
    dx_ref[0] = acc.astype(dx_ref.dtype)
    dw_ref[...] = dw_ref[...] + jnp.concatenate(rows, axis=0)
    db_ref[...] = db_ref[...] + jnp.sum(g32, axis=(0, 1))[None]


def _dw_bwd(ksize, res, g):
    x, w = res
    n, h, wdt, c = x.shape
    p = ksize // 2
    wf = w[::-1, ::-1, :]  # flipped filter for dx
    interpret = jax.default_backend() != "tpu"
    dx, dw, db = pl.pallas_call(
        functools.partial(_dw_bwd_kernel, ksize=ksize),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ksize, ksize, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ksize, ksize, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((ksize, ksize, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * p, wdt + 2 * p, c), jnp.float32),
            pltpu.VMEM((h + 2 * p, wdt + 2 * p, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n * h * wdt * c * ksize * ksize,
            bytes_accessed=3 * n * h * wdt * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, g, wf)
    return dx, dw.astype(w.dtype), db[0].astype(w.dtype)


depthwise_conv.defvjp(_dw_fwd, _dw_bwd)
