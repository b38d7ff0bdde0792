"""Fused ConvNeXt block tail: LN → pwconv1 → GELU → pwconv2 → γ-scale → +residual.

TPU-native replacement for the hot part of the frozen perceptual net (reference
perceptual_loss.py:41,63-64 runs torchvision ConvNeXt-S through cuDNN). Profile
(round 2, flagship TiTok-B step): the unfused XLA ConvNeXt spent ~45 ms/step on
LayerNorm statistics passes, the (N, 4C) MLP intermediate HBM round-trips and the
layout copies between them — on a ~245 GB/s part those are pure bandwidth. This
kernel keeps everything between the depthwise conv and the residual add in VMEM:
one read of (h, x), one write of y per row tile.

Layout: rows = flattened B·H·W (channels-last keeps C on lanes); the MLP weights use
constant index maps so they are fetched once and stay VMEM-resident across the grid.
Gated to C ≤ 384 (ConvNeXt-S stages 0-2 — 33 of 36 blocks): the stage-3 backward
would need three 768×3072 weight matrices resident (~14 MB), over the VMEM budget.

GELU is exact-erf semantics (torch nn.GELU default) — Pallas TPU has no erf
primitive, so erf comes from the Abramowitz-Stegun 7.1.26 rational approximation
(|ε| ≤ 1.5e-7, exp-only), well inside the 1e-3 golden-parity contract.

FROZEN-WEIGHT CONTRACT: the custom VJP returns real gradients only for the two
tensor inputs (h — the depthwise-conv output, and x — the residual). Cotangents for
ln_scale/ln_bias/w1/b1/w2/b2/gamma are ZERO: the perceptual net is frozen by
construction (reference perceptual_loss.py:44-47; the loss never differentiates wrt
its params). Training through this op would silently not update those weights — use
the unfused path for that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.kernels._partition import lead_spec, named

_SUBLANE = 8
MAX_FUSED_DIM = 384  # stage-3 (C=768) backward weights exceed the VMEM budget

_SQRT_2PI_INV = 0.3989422804014327  # 1/sqrt(2π)


def _erf(x):
    """erf via the round-5 tanh-composed quintic (ops/gelu.py fit,
    |ε| ≤ 3.7e-5 — 35× inside the 1e-3 golden-parity contract and far below
    bf16 activation resolution). Replaces the Abramowitz-Stegun 7.1.26
    rational form: A&S needs a DIVIDE + exp, which serialize the VPU behind
    the kernel's MXU matmuls (+23% on the fc1-shaped fusion probe,
    scripts/bench_fc1.py as_erf vs tanh_erf arms); tanh is cheap on this
    VPU."""
    from vit_tpu.ops.gelu import _C1, _C3, _C5

    u = jnp.clip(x, -4.0, 4.0)
    u2 = u * u
    return jnp.tanh(u * (_C1 + u2 * (_C3 + u2 * _C5)))


def _gelu(z):
    """Exact-erf-semantics GELU (torch nn.GELU default), fp32 in/out."""
    return 0.5 * z * (1.0 + _erf(z * 0.7071067811865476))


def _gelu_grad(z):
    """d/dz of _gelu — the flat hand-written derivative of the tanh-erf form
    (same finding as ops/gelu.py's custom_vjp: the flat expression schedules
    at the GEMM floor where exp/divide forms do not)."""
    from vit_tpu.ops.gelu import _C1, _C3, _C5

    u = jnp.clip(z * 0.7071067811865476, -4.0, 4.0)
    u2 = u * u
    p = u * (_C1 + u2 * (_C3 + u2 * _C5))
    t = jnp.tanh(p)
    dp = _C1 + u2 * (3 * _C3 + u2 * (5 * _C5))
    return (0.5 * (1.0 + t)
            + 0.5 * z * (1.0 - t * t) * dp * 0.7071067811865476)


def _normalize(h32, eps: float):
    """Per-row LN statistics; returns (û, rstd) in fp32."""
    mu = jnp.mean(h32, axis=-1, keepdims=True)
    d = h32 - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return d * rstd, rstd


def _fwd_kernel(h_ref, x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                g_ref, o_ref, *, eps: float):
    """One row tile: y = x + γ ⊙ (gelu(LN(h)·W1 + b1)·W2 + b2)."""
    dt = h_ref.dtype
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    uhat, _ = _normalize(h_ref[...].astype(jnp.float32), eps)
    u = uhat * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    z = jax.lax.dot_general(u.astype(dt), w1_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=prec)
    z = z + b1_ref[...].astype(jnp.float32)
    a = _gelu(z)
    o = jax.lax.dot_general(a.astype(dt), w2_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=prec)
    o = o + b2_ref[...].astype(jnp.float32)
    y = x_ref[...].astype(jnp.float32) + g_ref[...].astype(jnp.float32) * o
    o_ref[...] = y.astype(o_ref.dtype)


def _bwd_kernel(h_ref, dy_ref, lns_ref, lnb_ref, w1_ref, w1t_ref, w2t_ref,
                b1_ref, g_ref, dh_ref, *, eps: float):
    """dh for one row tile (recompute-from-h flash-style backward):
      do = γ⊙dy; da = do·W2ᵀ; dz = da⊙gelu'(z); du = dz·W1ᵀ;
      dh = rstd·(dû − mean(dû) − û⊙mean(dû⊙û)),  dû = du⊙ln_scale.
    The residual cotangent dx = dy needs no kernel (identity, added by the caller).
    """
    dt = h_ref.dtype
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    uhat, rstd = _normalize(h_ref[...].astype(jnp.float32), eps)
    u = uhat * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    z = jax.lax.dot_general(u.astype(dt), w1_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=prec)
    z = z + b1_ref[...].astype(jnp.float32)

    do = dy_ref[...].astype(jnp.float32) * g_ref[...].astype(jnp.float32)
    da = jax.lax.dot_general(do.astype(dt), w2t_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32, precision=prec)
    dz = da * _gelu_grad(z)
    du = jax.lax.dot_general(dz.astype(dt), w1t_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32, precision=prec)
    dhat = du * lns_ref[...].astype(jnp.float32)
    c1 = jnp.mean(dhat, axis=-1, keepdims=True)
    c2 = jnp.mean(dhat * uhat, axis=-1, keepdims=True)
    dh = rstd * (dhat - c1 - uhat * c2)
    dh_ref[...] = dh.astype(dh_ref.dtype)


def _quant_rows(v32):
    """Per-row symmetric int8 quantization (dynamic, in-kernel): v ≈ q · s."""
    absmax = jnp.max(jnp.abs(v32), axis=-1, keepdims=True)
    s = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(v32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _fwd_kernel_q8(h_ref, x_ref, lns_ref, lnb_ref, w1q_ref, w1s_ref, b1_ref,
                   w2q_ref, w2s_ref, b2_ref, g_ref, o_ref, *, eps: float):
    """int8 forward tile: both pwconv GEMMs run int8×int8→int32 on the MXU
    (2× the bf16 peak on v5e, 394 vs 197 TOPS) with dynamic per-row activation
    scales and per-output-channel frozen-weight scales — the weight-side
    quantization is exact-once (net is frozen), the activation side is the
    same dynamic scheme as core/quant.py:int8_matmul. VERDICT r3 next #1."""
    uhat, _ = _normalize(h_ref[...].astype(jnp.float32), eps)
    u = uhat * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    uq, us = _quant_rows(u)
    z = jax.lax.dot_general(uq, w1q_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    z = (z.astype(jnp.float32) * us * w1s_ref[...].astype(jnp.float32)
         + b1_ref[...].astype(jnp.float32))
    a = _gelu(z)
    aq, as_ = _quant_rows(a)
    o = jax.lax.dot_general(aq, w2q_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o = (o.astype(jnp.float32) * as_ * w2s_ref[...].astype(jnp.float32)
         + b2_ref[...].astype(jnp.float32))
    y = x_ref[...].astype(jnp.float32) + g_ref[...].astype(jnp.float32) * o
    o_ref[...] = y.astype(o_ref.dtype)


def _bwd_kernel_q8(h_ref, dy_ref, lns_ref, lnb_ref, w1q_ref, w1s_ref,
                   w1tq_ref, w1ts_ref, w2tq_ref, w2ts_ref, b1_ref, g_ref,
                   dh_ref, *, eps: float):
    """int8 dh tile (recompute-from-h): z recomputed with the SAME int8
    arithmetic as the forward (consistent straight-through gradient), and the
    two backward GEMMs (da = do·W2ᵀ, du = dz·W1ᵀ) run int8 too — the
    transposed weights carry their own per-output-channel scales."""
    uhat, rstd = _normalize(h_ref[...].astype(jnp.float32), eps)
    u = uhat * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    uq, us = _quant_rows(u)
    z = jax.lax.dot_general(uq, w1q_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    z = (z.astype(jnp.float32) * us * w1s_ref[...].astype(jnp.float32)
         + b1_ref[...].astype(jnp.float32))

    do = dy_ref[...].astype(jnp.float32) * g_ref[...].astype(jnp.float32)
    doq, dos = _quant_rows(do)
    da = jax.lax.dot_general(doq, w2tq_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    da = da.astype(jnp.float32) * dos * w2ts_ref[...].astype(jnp.float32)
    dz = da * _gelu_grad(z)
    dzq, dzs = _quant_rows(dz)
    du = jax.lax.dot_general(dzq, w1tq_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    du = du.astype(jnp.float32) * dzs * w1ts_ref[...].astype(jnp.float32)
    dhat = du * lns_ref[...].astype(jnp.float32)
    c1 = jnp.mean(dhat, axis=-1, keepdims=True)
    c2 = jnp.mean(dhat * uhat, axis=-1, keepdims=True)
    dh = rstd * (dhat - c1 - uhat * c2)
    dh_ref[...] = dh.astype(dh_ref.dtype)


def _quant_cols(w):
    """Per-output-channel symmetric int8 quantization of a (K, N) matrix
    (core/quant.py:quantize_kernel semantics, local to keep the kernel module
    import-light)."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0)
    s = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _row_tile(c: int) -> int:
    # VMEM: z fp32 (R, 4C) dominates; keep the bwd's three resident weight
    # matrices + tiles within budget.
    return 512 if c <= 256 else 256


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_rows(t, n_pad: int):
    n = t.shape[0]
    return t if n == n_pad else jnp.pad(t, ((0, n_pad - n), (0, 0)))


def _vec_spec(c):
    return pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)


def _mat_spec(a, b):
    return pl.BlockSpec((a, b), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _fwd_impl(h, x, lns, lnb, w1, b1, w2, b2, gamma, *, eps: float):
    n, c = h.shape
    c4 = w1.shape[1]
    r = _row_tile(c)
    n_pad = _ceil_to(max(n, _SUBLANE), r) if n > r else _ceil_to(n, _SUBLANE)
    r = min(r, n_pad)
    hp, xp = _pad_rows(h, n_pad), _pad_rows(x, n_pad)
    dt = h.dtype
    interpret = jax.default_backend() != "tpu"
    row = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(n_pad // r,),
        in_specs=[row, row, _vec_spec(c), _vec_spec(c), _mat_spec(c, c4),
                  _vec_spec(c4), _mat_spec(c4, c), _vec_spec(c), _vec_spec(c)],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((n_pad, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * c * c4,
            bytes_accessed=3 * n_pad * c * dt.itemsize,
            transcendentals=n_pad * c4,
        ),
        interpret=interpret,
    )(hp, xp, lns.astype(dt), lnb.astype(dt), w1.astype(dt),
      b1.astype(dt), w2.astype(dt), b2.astype(dt), gamma.astype(dt))
    return out[:n]


def _bwd_impl(h, g, lns, lnb, w1, b1, gamma, *, eps: float, w2):
    n, c = h.shape
    c4 = w1.shape[1]
    r = _row_tile(c)
    n_pad = _ceil_to(max(n, _SUBLANE), r) if n > r else _ceil_to(n, _SUBLANE)
    r = min(r, n_pad)
    hp, gp = _pad_rows(h, n_pad), _pad_rows(g, n_pad)
    dt = h.dtype
    interpret = jax.default_backend() != "tpu"
    row = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dh = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(n_pad // r,),
        in_specs=[row, row, _vec_spec(c), _vec_spec(c), _mat_spec(c, c4),
                  _mat_spec(c4, c), _mat_spec(c, c4), _vec_spec(c4),
                  _vec_spec(c)],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((n_pad, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=6 * n_pad * c * c4,
            bytes_accessed=3 * n_pad * c * dt.itemsize,
            transcendentals=2 * n_pad * c4,
        ),
        interpret=interpret,
    )(hp, gp, lns.astype(dt), lnb.astype(dt), w1.astype(dt),
      jnp.swapaxes(w1, 0, 1).astype(dt), jnp.swapaxes(w2, 0, 1).astype(dt),
      b1.astype(dt), gamma.astype(dt))
    return dh[:n]


def _fwd_impl_q8(h, x, lns, lnb, w1, b1, w2, b2, gamma, *, eps: float):
    n, c = h.shape
    c4 = w1.shape[1]
    r = _row_tile(c)
    n_pad = _ceil_to(max(n, _SUBLANE), r) if n > r else _ceil_to(n, _SUBLANE)
    r = min(r, n_pad)
    hp, xp = _pad_rows(h, n_pad), _pad_rows(x, n_pad)
    dt = h.dtype
    interpret = jax.default_backend() != "tpu"
    # weight quantization happens in XLA outside the kernel: exact-once math
    # (frozen net), recomputed per step at negligible cost (~600k elements)
    w1q, w1s = _quant_cols(w1)
    w2q, w2s = _quant_cols(w2)
    row = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_q8, eps=eps),
        grid=(n_pad // r,),
        in_specs=[row, row, _vec_spec(c), _vec_spec(c), _mat_spec(c, c4),
                  _vec_spec(c4), _vec_spec(c4), _mat_spec(c4, c), _vec_spec(c),
                  _vec_spec(c), _vec_spec(c)],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((n_pad, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * c * c4,
            bytes_accessed=3 * n_pad * c * dt.itemsize,
            transcendentals=n_pad * c4,
        ),
        interpret=interpret,
    )(hp, xp, lns.astype(dt), lnb.astype(dt), w1q, w1s,
      b1.astype(dt), w2q, w2s, b2.astype(dt), gamma.astype(dt))
    return out[:n]


def _bwd_impl_q8(h, g, lns, lnb, w1, b1, gamma, *, eps: float, w2):
    n, c = h.shape
    c4 = w1.shape[1]
    r = _row_tile(c)
    n_pad = _ceil_to(max(n, _SUBLANE), r) if n > r else _ceil_to(n, _SUBLANE)
    r = min(r, n_pad)
    hp, gp = _pad_rows(h, n_pad), _pad_rows(g, n_pad)
    dt = h.dtype
    interpret = jax.default_backend() != "tpu"
    w1q, w1s = _quant_cols(w1)
    w1tq, w1ts = _quant_cols(jnp.swapaxes(w1, 0, 1))
    w2tq, w2ts = _quant_cols(jnp.swapaxes(w2, 0, 1))
    row = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dh = pl.pallas_call(
        functools.partial(_bwd_kernel_q8, eps=eps),
        grid=(n_pad // r,),
        in_specs=[row, row, _vec_spec(c), _vec_spec(c), _mat_spec(c, c4),
                  _vec_spec(c4), _mat_spec(c4, c), _vec_spec(c),
                  _mat_spec(c, c4), _vec_spec(c4), _vec_spec(c4),
                  _vec_spec(c)],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((n_pad, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=6 * n_pad * c * c4,
            bytes_accessed=3 * n_pad * c * dt.itemsize,
            transcendentals=2 * n_pad * c4,
        ),
        interpret=interpret,
    )(hp, gp, lns.astype(dt), lnb.astype(dt), w1q, w1s, w1tq, w1ts,
      w2tq, w2ts, b1.astype(dt), gamma.astype(dt))
    return dh[:n]


_FWD_IMPLS = {"none": _fwd_impl, "int8": _fwd_impl_q8}
_BWD_IMPLS = {"none": _bwd_impl, "int8": _bwd_impl_q8}


# --- GSPMD partitioning: rows (flattened batch·spatial) shard freely -----------

@functools.lru_cache(maxsize=None)
def _fwd_cp(eps: float, quant: str = "none"):
    from jax.experimental.custom_partitioning import custom_partitioning

    impl = _FWD_IMPLS[quant]

    @custom_partitioning
    def fwd(h, x, lns, lnb, w1, b1, w2, b2, gamma):
        return impl(h, x, lns, lnb, w1, b1, w2, b2, gamma, eps=eps)

    def infer(mesh, arg_infos, result_infos):
        (nspec,) = lead_spec(arg_infos[0], 1)
        return named(mesh, nspec, None)

    def part(mesh, arg_infos, result_infos):
        (nspec,) = lead_spec(arg_infos[0], 1)
        sh = named(mesh, nspec, None)
        rep2 = named(mesh, None, None)
        rep1 = named(mesh, None)
        arg_sh = (sh, sh, rep1, rep1, rep2, rep1, rep2, rep1, rep1)

        def lower(h, x, lns, lnb, w1, b1, w2, b2, gamma):
            return impl(h, x, lns, lnb, w1, b1, w2, b2, gamma, eps=eps)

        return mesh, lower, sh, arg_sh

    fwd.def_partition(
        partition=part, infer_sharding_from_operands=infer,
        sharding_rule="n c, n c, c, c, c f, f, f c, c, c -> n c")
    return fwd


@functools.lru_cache(maxsize=None)
def _bwd_cp(eps: float, quant: str = "none"):
    from jax.experimental.custom_partitioning import custom_partitioning

    impl = _BWD_IMPLS[quant]

    @custom_partitioning
    def bwd(h, g, lns, lnb, w1, b1, w2, gamma):
        return impl(h, g, lns, lnb, w1, b1, gamma, eps=eps, w2=w2)

    def infer(mesh, arg_infos, result_infos):
        (nspec,) = lead_spec(arg_infos[0], 1)
        return named(mesh, nspec, None)

    def part(mesh, arg_infos, result_infos):
        (nspec,) = lead_spec(arg_infos[0], 1)
        sh = named(mesh, nspec, None)
        rep2 = named(mesh, None, None)
        rep1 = named(mesh, None)
        arg_sh = (sh, sh, rep1, rep1, rep2, rep1, rep2, rep1)

        def lower(h, g, lns, lnb, w1, b1, w2, gamma):
            return impl(h, g, lns, lnb, w1, b1, gamma, eps=eps, w2=w2)

        return mesh, lower, sh, arg_sh

    bwd.def_partition(
        partition=part, infer_sharding_from_operands=infer,
        sharding_rule="n c, n c, c, c, c f, f, f c, c -> n c")
    return bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _block_tail(h, x, lns, lnb, w1, b1, w2, b2, gamma, eps, quant):
    return _fwd_cp(eps, quant)(h, x, lns, lnb, w1, b1, w2, b2, gamma)


def _tail_fwd(h, x, lns, lnb, w1, b1, w2, b2, gamma, eps, quant):
    y = _fwd_cp(eps, quant)(h, x, lns, lnb, w1, b1, w2, b2, gamma)
    return y, (h, lns, lnb, w1, b1, w2, b2, gamma)


def _tail_bwd(eps, quant, res, g):
    h, lns, lnb, w1, b1, w2, b2, gamma = res
    dh = _bwd_cp(eps, quant)(h, g, lns, lnb, w1, b1, w2, gamma)
    # FROZEN-WEIGHT CONTRACT (module docstring): parameter cotangents are zero.
    zeros = jax.tree.map(jnp.zeros_like, (lns, lnb, w1, b1, w2, b2, gamma))
    return (dh, g, *zeros)


_block_tail.defvjp(_tail_fwd, _tail_bwd)


def fused_supported(c: int, c4: int) -> bool:
    return c <= MAX_FUSED_DIM and c4 == 4 * c


def frozen_convnext_block_tail(h, x, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                               *, eps: float = 1e-6, quant: str = "none"):
    """y = x + γ ⊙ (gelu(LN(h)·W1 + b1)·W2 + b2), fused in VMEM per row tile.

    h, x: (N, C) — the depthwise-conv output and the block input (residual),
    rows = flattened batch·spatial. Gradients flow to h and x ONLY (frozen-weight
    contract, see module docstring). Caller must check ``fused_supported(C, 4C)``.

    ``quant="int8"``: both pwconv GEMMs (forward AND the dx-only backward)
    run int8×int8→int32 on the MXU at 2× the bf16 peak (394 vs 197 TOPS on
    v5e) — valid for the frozen perceptual net only (per-step weight
    quantization is exact-once math; activation scales are dynamic per row;
    the straight-through backward recomputes z with IDENTICAL int8
    arithmetic). VERDICT r3 next #1.
    """
    return _block_tail(h, x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, eps,
                       quant)
