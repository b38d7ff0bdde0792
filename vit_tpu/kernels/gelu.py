"""Fused bias + exact-erf GELU with a bias-gradient-emitting backward.

Motivation (round-2 flagship profile): the MLP backward's fc1 bias gradient is
``colsum(dz)`` where dz is the (B·S, 4C) GELU cotangent — XLA materializes dz
for the dW/dx matmuls and then RE-READS the whole plane (~126 MB/layer at
TiTok-B bs64) just to reduce it: ~0.6 ms × 24 layers of pure HBM traffic.
Here the backward kernel computes dz AND per-program partial column sums in the
same VMEM pass (the pattern proven by the attention qkv-bias gradient,
kernels/attention.py): partials are (n_prog, 8, F) fp32 — a few MB — reduced by
XLA. Cross-program accumulation into one resident block is deliberately NOT
used (measured on the attention kernel: read-modify-write serializes the grid).

The forward adds the bias and applies exact-erf GELU (torch nn.GELU default,
reference transformer.py:40) — same A&S 7.1.26 erf as the ConvNeXt tail kernel,
|ε| ≤ 1.5e-7. Callers pass the UNBIASED matmul output; gradients flow to both
operands. XLA fallback (CPU / impl="xla") is bit-equivalent jnp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning

from vit_tpu.kernels._partition import lead_spec, named
from vit_tpu.kernels.convnext_block import _gelu, _gelu_grad

_SUBLANE = 8
_LANES = 128
# 128 rows: at F=3072 the fp32 working set (z, gelu/grad temps, dz) plus
# double-buffered bf16 tiles measured 20.9 MB at R=256 — over the 16 MB scoped
# VMEM budget; R=128 stays comfortably inside for F up to 4096 (L preset).
_ROW_TILE = 128


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(z_ref, b_ref, a_ref):
    z = z_ref[...].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    a_ref[...] = _gelu(z).astype(a_ref.dtype)


def _bwd_kernel(z_ref, b_ref, da_ref, dz_ref, dbp_ref):
    z = z_ref[...].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    dz = da_ref[...].astype(jnp.float32) * _gelu_grad(z)
    dz_ref[...] = dz.astype(dz_ref.dtype)
    # per-program partial bias grad: row 0 = column sum of this tile (zero-padded
    # rows contribute exact zeros); rows 1..7 are explicit zeros.
    part = jnp.sum(dz, axis=0, keepdims=True)                   # (1, F)
    pad = jnp.zeros((_SUBLANE - 1, part.shape[1]), jnp.float32)
    dbp_ref[0] = jnp.concatenate([part, pad], axis=0)


def _prep(z, bias):
    n, f = z.shape
    npad = _ceil_to(max(n, _SUBLANE), _ROW_TILE) if n > _ROW_TILE \
        else _ceil_to(n, _SUBLANE)
    r = min(_ROW_TILE, npad)
    zp = z if npad == n else jnp.pad(z, ((0, npad - n), (0, 0)))
    b2 = jnp.broadcast_to(bias.astype(z.dtype), (_SUBLANE, f))
    return zp, b2, npad, r


def _fwd_impl(z, bias):
    n, f = z.shape
    zp, b2, npad, r = _prep(z, bias)
    interpret = jax.default_backend() != "tpu"
    row = pl.BlockSpec((r, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(npad // r,),
        in_specs=[row, pl.BlockSpec((_SUBLANE, f), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((npad, f), z.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * npad * f, bytes_accessed=2 * npad * f * z.dtype.itemsize,
            transcendentals=npad * f),
        interpret=interpret,
    )(zp, b2)
    return out[:n]


def _bwd_impl(z, bias, da):
    n, f = z.shape
    zp, b2, npad, r = _prep(z, bias)
    dap = da if npad == n else jnp.pad(da, ((0, npad - n), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    row = pl.BlockSpec((r, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dz, dbp = pl.pallas_call(
        _bwd_kernel,
        grid=(npad // r,),
        in_specs=[row,
                  pl.BlockSpec((_SUBLANE, f), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  row],
        out_specs=(row,
                   pl.BlockSpec((1, _SUBLANE, f), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((npad, f), z.dtype),
                   jax.ShapeDtypeStruct((npad // r, _SUBLANE, f),
                                        jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=12 * npad * f, bytes_accessed=3 * npad * f * z.dtype.itemsize,
            transcendentals=2 * npad * f),
        interpret=interpret,
    )(zp, b2, dap)
    return dz[:n], dbp[:, 0, :].sum(axis=0)


@functools.lru_cache(maxsize=None)
def _fwd_cp():
    @custom_partitioning
    def fwd(z, bias):
        b, s, f = z.shape
        return _fwd_impl(z.reshape(b * s, f), bias).reshape(b, s, f)

    def infer(mesh, arg_infos, result_infos):
        (bspec,) = lead_spec(arg_infos[0], 1)
        return named(mesh, bspec, None, None)

    def part(mesh, arg_infos, result_infos):
        (bspec,) = lead_spec(arg_infos[0], 1)
        sh = named(mesh, bspec, None, None)
        arg_sh = (sh, named(mesh, None))

        def lower(z, bias):
            b, s, f = z.shape
            return _fwd_impl(z.reshape(b * s, f), bias).reshape(b, s, f)

        return mesh, lower, sh, arg_sh

    fwd.def_partition(partition=part, infer_sharding_from_operands=infer,
                      sharding_rule="b s f, f -> b s f")
    return fwd


@functools.lru_cache(maxsize=None)
def _bwd_cp():
    @custom_partitioning
    def bwd(z, bias, da):
        b, s, f = z.shape
        dz, db = _bwd_impl(z.reshape(b * s, f), bias, da.reshape(b * s, f))
        return dz.reshape(b, s, f), db

    def infer(mesh, arg_infos, result_infos):
        (bspec,) = lead_spec(arg_infos[0], 1)
        return (named(mesh, bspec, None, None), named(mesh, None))

    def part(mesh, arg_infos, result_infos):
        (bspec,) = lead_spec(arg_infos[0], 1)
        sh = named(mesh, bspec, None, None)
        arg_sh = (sh, named(mesh, None), sh)
        axes = bspec if isinstance(bspec, tuple) else \
            ((bspec,) if bspec else ())

        def lower(z, bias, da):
            b, s, f = z.shape
            dz, db = _bwd_impl(z.reshape(b * s, f), bias,
                               da.reshape(b * s, f))
            if axes:
                db = jax.lax.psum(db, tuple(axes))
            return dz.reshape(b, s, f), db

        return mesh, lower, (sh, named(mesh, None)), arg_sh

    bwd.def_partition(partition=part, infer_sharding_from_operands=infer,
                      sharding_rule="b s f, f, b s f -> b s f, f")
    return bwd


@jax.custom_vjp
def _bias_gelu(z, bias):
    return _fwd_cp()(z, bias)


def _bg_fwd(z, bias):
    return _fwd_cp()(z, bias), (z, bias)


def _bg_bwd(res, da):
    z, bias = res
    dz, db = _bwd_cp()(z, bias, da)
    return dz, db.astype(bias.dtype)


_bias_gelu.defvjp(_bg_fwd, _bg_bwd)


def bias_gelu(z: jax.Array, bias: jax.Array, impl: "str | None" = None
              ) -> jax.Array:
    """gelu(z + bias), exact-erf. z: (B, S, F) UNBIASED matmul output,
    bias: (F,). Pallas on TPU (backward emits the bias gradient from VMEM —
    see module docstring); bit-equivalent jnp elsewhere."""
    if impl is None:
        try:
            impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
        except RuntimeError:  # pragma: no cover
            impl = "xla"
    if impl == "pallas":
        return _bias_gelu(z, bias)
    return jax.nn.gelu(z + bias.astype(z.dtype), approximate=False)
