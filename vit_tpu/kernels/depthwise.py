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


def _dw_bwd(ksize, res, g):
    x, w = res
    # dx: correlate g with the flipped filter (same kernel, zero bias)
    wf = w[::-1, ::-1, :]
    zeros = jnp.zeros((w.shape[-1],), w.dtype)
    dx = _dw_forward(g, wf, zeros, ksize=ksize).astype(x.dtype)
    # dw[di,dj,c] = Σ_{n,h,w} xpad[n, h+di, w+dj, c] · g[n,h,w,c]
    p = ksize // 2
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (p, p), (p, p), (0, 0)))
    n, h, wdt, c = x.shape
    g32 = g.astype(jnp.float32)
    dw = jnp.stack([
        jnp.stack([
            jnp.sum(xp[:, di:di + h, dj:dj + wdt, :] * g32, axis=(0, 1, 2))
            for dj in range(ksize)], axis=0)
        for di in range(ksize)], axis=0).astype(w.dtype)
    db = jnp.sum(g32, axis=(0, 1, 2)).astype(w.dtype)
    return dx, dw, db


depthwise_conv.defvjp(_dw_fwd, _dw_bwd)
