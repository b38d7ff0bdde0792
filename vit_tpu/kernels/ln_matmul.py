"""Fused (non-affine) LayerNorm → matmul [→ +bias → GELU] forward, and the
matching LayerNorm-backward kernel.

Motivation (round-3 perf pool, BENCHMARKS.md): in the unfused pre-LN transformer
(core/transformer.py) every LayerNorm pays one full activation read for its
statistics pass before XLA can fuse the normalize into the consumer matmul's
operand read, and AD saves fp32 LN intermediates. 48 LN sites on the flagship
TiTok-B step ≈ 4-5 ms of pure HBM bandwidth. This kernel computes the row
statistics in VMEM and feeds the MXU directly: one read of x, one write of the
matmul output (plus the bf16 x̂ residual the backward's dW matmul needs — which,
for the non-affine LN the minimal core uses (reference transformer.py:43-44),
is exactly the LN output XLA would have materialized anyway).

Scope: ln_affine=False only (the author's minimal core; the Bytedance affine
path stays on XLA). The GELU epilogue keeps fc1's activation inside the kernel —
splitting it out was round 2's measured negative (a standalone bias+GELU kernel,
since pruned, regressed the flagship 260→227 img/s): a full (B·S, 4C) HBM
round-trip per layer.

Backward split (per site, orchestrated in the custom_vjp at XLA level):
  dzpre = dz ⊙ gelu'(zpre)            (XLA elementwise, only for the GELU site)
  db    = Σ_rows dzpre                 (XLA reduction)
  dW    = x̂ᵀ · dzpre                  (XLA matmul on the saved bf16 x̂)
  dx̂    = dzpre · Wᵀ                  (XLA matmul)
  dx    = ln_backward(x, dx̂)          (Pallas: stats recomputed in VMEM)
Only the two stats-dependent pieces need Pallas; the matmuls are already at
roofline in XLA and GSPMD partitions them (Megatron column split on W stays).

Grid: (row tiles, F tiles), F innermost so the x block and its statistics stay
resident while W streams. Per-program dk/dv-style accumulation is not needed —
each (i, j) writes its own z block once (the x̂ block is rewritten with identical
values across j, which Mosaic flushes once when i advances).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.kernels._partition import lead_spec, named
from vit_tpu.kernels.convnext_block import _gelu, _gelu_grad

_SUBLANE = 8
_LANE = 128
_EPS = 1e-5  # matches core.transformer.LayerNorm


def _stats(x32):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    d = x32 - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    return d * rstd, rstd


def _fwd_kernel(x_ref, w_ref, b_ref, z_ref, zpre_ref, y_ref, *, act: bool,
                has_bias: bool):
    dt = x_ref.dtype
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    xhat32, _ = _stats(x_ref[...].astype(jnp.float32))
    u = xhat32.astype(dt)
    y_ref[...] = u  # bf16 x̂ residual (identical value across the j grid dim)
    acc = jax.lax.dot_general(u, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)
    if has_bias:
        acc = acc + b_ref[...].astype(jnp.float32)
    if act:
        zpre_ref[...] = acc.astype(dt)
        acc = _gelu(acc)
    z_ref[...] = acc.astype(dt)


def _ln_bwd_kernel(x_ref, g_ref, dx_ref):
    """dx for non-affine LN: dx = rstd·(g − mean(g) − x̂ ⊙ mean(g ⊙ x̂))."""
    xhat, rstd = _stats(x_ref[...].astype(jnp.float32))
    g = g_ref[...].astype(jnp.float32)
    c1 = jnp.mean(g, axis=-1, keepdims=True)
    c2 = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (g - c1 - xhat * c2)).astype(dx_ref.dtype)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_rows(t, n_pad: int):
    n = t.shape[0]
    return t if n == n_pad else jnp.pad(t, ((0, n_pad - n), (0, 0)))


def _f_tile(f: int) -> int:
    for fb in (512, 384, 256, 128):
        if f % fb == 0:
            return fb
    return f


def supported(c: int, f: int) -> bool:
    return c % _LANE == 0 and f % _LANE == 0


def _fwd_impl(x, w, b, *, act: bool, has_bias: bool):
    n, c = x.shape
    f = w.shape[1]
    fb = _f_tile(f)
    r = 512
    n_pad = _ceil_to(max(n, _SUBLANE), r) if n > r else _ceil_to(n, _SUBLANE)
    r = min(r, n_pad)
    xp = _pad_rows(x, n_pad)
    dt = x.dtype
    interpret = jax.default_backend() != "tpu"
    out_shapes = (jax.ShapeDtypeStruct((n_pad, f), dt),       # z
                  jax.ShapeDtypeStruct((n_pad, f) if act else (1, 1), dt),
                  jax.ShapeDtypeStruct((n_pad, c), dt))       # x̂
    zspec = pl.BlockSpec((r, fb), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    z, zpre, y = pl.pallas_call(
        functools.partial(_fwd_kernel, act=act, has_bias=has_bias),
        grid=(n_pad // r, f // fb),
        in_specs=[
            pl.BlockSpec((r, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, fb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(zspec,
                   zspec if act else pl.BlockSpec(
                       (1, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((r, c), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * c * f,
            bytes_accessed=(n_pad * c + c * f + n_pad * f) * dt.itemsize,
            transcendentals=n_pad * f if act else 0,
        ),
        interpret=interpret,
    )(xp, w, (b if has_bias else jnp.zeros((f,), dt)).reshape(1, f))
    if n_pad != n:
        z, y = z[:n], y[:n]
        zpre = zpre[:n] if act else zpre
    return z, zpre, y


def _dgelu_kernel(zpre_ref, dz_ref, dzc_ref):
    z32 = zpre_ref[...].astype(jnp.float32)
    dzc_ref[...] = (dz_ref[...].astype(jnp.float32)
                    * _gelu_grad(z32)).astype(dzc_ref.dtype)


def _dgelu_impl(zpre, dz):
    """dzc = dz ⊙ gelu'(zpre), one HBM pass. XLA leaves the bf16→f32 convert of
    the saved zpre residual as a standalone op feeding the gelu' fusion
    (measured: 0.62 ms × 24 sites on the flagship), tripling the read traffic;
    in-kernel the cast lives in VMEM."""
    n, f = zpre.shape
    fb = _f_tile(f)
    r = 256
    n_pad = _ceil_to(max(n, _SUBLANE), r) if n > r else _ceil_to(n, _SUBLANE)
    r = min(r, n_pad)
    interpret = jax.default_backend() != "tpu"
    blk = pl.BlockSpec((r, fb), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    dzc = pl.pallas_call(
        _dgelu_kernel,
        grid=(n_pad // r, f // fb),
        in_specs=[blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), dz.dtype),
        cost_estimate=pl.CostEstimate(
            flops=12 * n_pad * f,
            bytes_accessed=3 * n_pad * f * dz.dtype.itemsize,
            transcendentals=2 * n_pad * f,
        ),
        interpret=interpret,
    )(_pad_rows(zpre, n_pad), _pad_rows(dz, n_pad))
    return dzc[:n]


def _ln_bwd_impl(x, g):
    n, c = x.shape
    r = 512
    n_pad = _ceil_to(max(n, _SUBLANE), r) if n > r else _ceil_to(n, _SUBLANE)
    r = min(r, n_pad)
    xp, gp = _pad_rows(x, n_pad), _pad_rows(g, n_pad)
    interpret = jax.default_backend() != "tpu"
    row = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        _ln_bwd_kernel,
        grid=(n_pad // r,),
        in_specs=[row, row],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((n_pad, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * n_pad * c,
            bytes_accessed=3 * n_pad * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, gp)
    return dx[:n]


# --- GSPMD partitioning: batch shards; W keeps its Megatron column split -------

from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402


def _flat3(fn):
    """Lift an (N, C)-rows impl to (B, S, C) operands: every rank-3 input is
    flattened over its leading two dims, rank-2 (N, ·) outputs are restored."""

    def wrapped(x, *rest):
        b, s, c = x.shape
        args = [x.reshape(b * s, c)]
        args += [a.reshape(b * s, -1) if getattr(a, "ndim", 0) == 3 else a
                 for a in rest]
        outs = fn(*args)
        if not isinstance(outs, tuple):
            outs = (outs,)
        return tuple(o.reshape(b, s, -1) if o.ndim == 2 and o.shape[0] == b * s
                     else o for o in outs)

    return wrapped


@functools.lru_cache(maxsize=None)
def _fwd_cp(act: bool, has_bias: bool):
    @custom_partitioning
    def fwd(x, w, b):
        z, zpre, y = _flat3(
            lambda xr, wr, br: _fwd_impl(xr, wr, br, act=act,
                                         has_bias=has_bias))(x, w, b)
        return z, zpre, y

    def infer(mesh, arg_infos, result_infos):
        (bspec,) = lead_spec(arg_infos[0], 1)
        wcol = lead_spec(arg_infos[1], 2)[1]
        zsh = named(mesh, bspec, None, wcol)
        return (zsh, zsh if act else named(mesh, None, None),
                named(mesh, bspec, None, None))

    def part(mesh, arg_infos, result_infos):
        (bspec,) = lead_spec(arg_infos[0], 1)
        wcol = lead_spec(arg_infos[1], 2)[1]
        xsh = named(mesh, bspec, None, None)
        zsh = named(mesh, bspec, None, wcol)
        arg_sh = (xsh, named(mesh, None, wcol), named(mesh, wcol))
        out_sh = (zsh, zsh if act else named(mesh, None, None),
                  named(mesh, bspec, None, None))

        def lower(x, w, b):
            return _flat3(lambda xr, wr, br: _fwd_impl(
                xr, wr, br, act=act, has_bias=has_bias))(x, w, b)

        return mesh, lower, out_sh, arg_sh

    # z/zpre inherit W's column factor; x̂ inherits x's layout.
    rule = ("b s c, c f, f -> b s f, b s f, b s c" if act
            else "b s c, c f, f -> b s f, e g, b s c")
    fwd.def_partition(partition=part, infer_sharding_from_operands=infer,
                      sharding_rule=rule)
    return fwd


@functools.lru_cache(maxsize=None)
def _dgelu_cp():
    @custom_partitioning
    def dgelu(zpre, dz):
        return _flat3(_dgelu_impl)(zpre, dz)[0]

    def infer(mesh, arg_infos, result_infos):
        (bspec,) = lead_spec(arg_infos[0], 1)
        fcol = lead_spec(arg_infos[0], 3)[2]
        return named(mesh, bspec, None, fcol)

    def part(mesh, arg_infos, result_infos):
        (bspec,) = lead_spec(arg_infos[0], 1)
        fcol = lead_spec(arg_infos[0], 3)[2]
        sh = named(mesh, bspec, None, fcol)

        def lower(zpre, dz):
            return _flat3(_dgelu_impl)(zpre, dz)[0]

        return mesh, lower, sh, (sh, sh)

    dgelu.def_partition(partition=part, infer_sharding_from_operands=infer,
                        sharding_rule="b s f, b s f -> b s f")
    return dgelu


@functools.lru_cache(maxsize=None)
def _ln_bwd_cp():
    @custom_partitioning
    def bwd(x, g):
        return _flat3(_ln_bwd_impl)(x, g)[0]

    def infer(mesh, arg_infos, result_infos):
        (bspec,) = lead_spec(arg_infos[0], 1)
        return named(mesh, bspec, None, None)

    def part(mesh, arg_infos, result_infos):
        (bspec,) = lead_spec(arg_infos[0], 1)
        sh = named(mesh, bspec, None, None)

        def lower(x, g):
            return _flat3(_ln_bwd_impl)(x, g)[0]

        return mesh, lower, sh, (sh, sh)

    bwd.def_partition(partition=part, infer_sharding_from_operands=infer,
                      sharding_rule="b s c, b s c -> b s c")
    return bwd


def _flat_wrap(x, fn):
    """Run an (N,C) impl over (B,S,C) by flattening leading dims."""
    b, s, c = x.shape
    return fn(x.reshape(b * s, c)).reshape(b, s, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln_matmul(x, w, b, act: bool, has_bias: bool):
    z, _, _ = _fwd_cp(act, has_bias)(x, w, b)
    return z


def _lnmm_fwd(x, w, b, act, has_bias):
    z, zpre, y = _fwd_cp(act, has_bias)(x, w, b)
    return z, (x, w, zpre, y)


def _lnmm_bwd(act, has_bias, res, dz):
    x, w, zpre, y = res
    # dzc must stay a single bf16 materialization: it feeds two matmuls (which
    # force operand materialization anyway) and the db reduce. The gelu' factor
    # runs in a Pallas elementwise kernel because XLA leaves the bf16→f32
    # convert of the saved zpre residual standalone ahead of the gelu' fusion
    # (measured: 0.62 ms × 24 flagship sites of pure extra HBM traffic).
    dzc = _dgelu_cp()(zpre, dz) if act else dz
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
    dw = jnp.einsum("bsc,bsf->cf", y, dzc,
                    preferred_element_type=jnp.float32,
                    precision=prec).astype(w.dtype)
    dxhat = jnp.einsum("bsf,cf->bsc", dzc, w,
                       preferred_element_type=jnp.float32,
                       precision=prec).astype(x.dtype)
    dx = _ln_bwd_cp()(x, dxhat)
    db = (jnp.sum(dzc, axis=(0, 1), dtype=jnp.float32) if has_bias
          else jnp.zeros((w.shape[1],), jnp.float32)).astype(w.dtype)
    return dx, dw, db


_ln_matmul.defvjp(_lnmm_fwd, _lnmm_bwd)


def fused_ln_matmul(x, w, b=None, *, gelu: bool = False):
    """z = [gelu](LN(x) · w [+ b]) with non-affine fp32-stat LayerNorm fused
    into the matmul read. x: (B, S, C); w: (C, F); b: (F,) or None.
    Caller must check ``supported(C, F)``."""
    has_bias = b is not None
    if b is None:
        b = jnp.zeros((w.shape[1],), w.dtype)
    return _ln_matmul(x, w, b.astype(w.dtype), gelu, has_bias)
