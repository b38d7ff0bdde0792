"""Fused multi-head attention Pallas kernel for TPU.

TPU-native replacement for the reference's ``F.scaled_dot_product_attention`` /
``nn.MultiheadAttention`` fast paths (reference: transformer.py:28, blocks.py:44,102).

Design (sized for this model family: S ≤ ~4k tokens, head_dim 64):
  - grid = (B*H, num_q_blocks): each program owns one q block; the full K/V for that
    (batch, head) sits in VMEM (a few hundred KB at these sequence lengths), so a single
    stable-softmax pass suffices — no online-softmax accumulation state is needed, while
    still never materializing the (S, S) score matrix in HBM.
  - scores and softmax in fp32 (the "fp32 island"); the PV matmul runs in the input
    dtype on the MXU with fp32 accumulation.
  - causal masking via 2-D iota comparison — the additive −inf buffer of the reference
    (transformer.py:22-25) becomes a register-level predicate, no mask tensor in memory.
  - odd sequence lengths (e.g. 257 = 1 cls + 256 patches) are padded only to sublane
    granularity (8) and masked — the flagship S=320 runs with zero padding copies.

Backward: custom VJP into a fused single-program Pallas backward (_fa_bwd_kernel) that
keeps every (S,S) intermediate in VMEM; beyond _MAX_FUSED_BWD_SEQ it falls back to an
XLA rematerialized backward (no residuals besides q,k,v either way).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.attention import attention_xla

# The sequence axis sits on SUBLANES (the last axis is head_dim): 8-alignment
# suffices (fp32 tile granularity), so e.g. the flagship S=320 needs NO padding
# (128-alignment would copy-pad every q/k/v to 384 on every call).
_SUBLANE = 8
_MAX_FUSED_SEQ = 8192  # beyond this, fall back to the XLA path (VMEM budget)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dropout_mask(seed_ref, shape, rate: float):
    """Deterministic per-(batch·head) dropout keep-mask scaled by 1/keep (fp32).

    Counter-based (murmur3-finalizer over position iota ⊕ seed ⊕ program id) rather
    than pltpu.prng_* so the identical stream exists in compiled AND interpret mode
    (CPU tests) and the backward kernel regenerates it exactly. Dropout is only fused
    when the whole sequence is one q block, so grid dim 0 identifies the mask."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = r * jnp.uint32(shape[1]) + c
    x = x ^ (seed_ref[0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    x = x + pl.program_id(0).astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    keep = x >= jnp.uint32(int(rate * 0xFFFFFFFF))
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _fa_kernel(q_ref, kt_ref, v_ref, seed_ref, o_ref, *, scale: float,
               causal: bool, seq_len: int, block_q: int, dropout_rate: float):
    """One q-block of fused attention. Shapes: q (1,BQ,D), kᵀ (1,D,Sp), v (1,Sp,D),
    o (1,BQ,D). K is pre-transposed so the QKᵀ contraction is a standard (M,K)×(K,N)
    MXU matmul (Mosaic rejects a bf16 dim-1×dim-1 contraction). With dropout_rate>0
    the post-softmax probabilities are dropped in-kernel (torch SDPA semantics,
    reference transformer.py:28) using the on-core PRNG."""
    iq = pl.program_id(1)
    q = q_ref[0]                      # (BQ, D)
    kt = kt_ref[0]                    # (D, Sp)
    v = v_ref[0]                      # (Sp, D)
    sp = kt.shape[1]
    bq = q.shape[0]

    # fp32 inputs get true-fp32 matmuls (multi-pass); bf16 inputs use the native
    # single-pass MXU path (Mosaic rejects forced-fp32 contraction of bf16 operands).
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    s = jax.lax.dot_general(
        q, kt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) * scale                          # (BQ, Sp) fp32

    col = jax.lax.broadcasted_iota(jnp.int32, (bq, sp), dimension=1)
    valid = col < seq_len              # mask key padding
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, sp), dimension=0)
        valid = jnp.logical_and(valid, col <= row + iq * block_q)
    neg = jnp.finfo(jnp.float32).min
    s = jnp.where(valid, s, neg)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)                 # masked entries: exp(neg - m) ≈ 0
    l = jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        # D∘(p/l) = (D∘p)/l — drop before the PV matmul, keep the normalizer
        p = p * _dropout_mask(seed_ref, (bq, sp), dropout_rate)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) / l
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_attention_fwd_impl(q, k, v, seed, causal: bool,
                              dropout_rate: float):
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    if s <= 512:
        block_q = sp = _ceil_to(s, _SUBLANE)   # single q block, minimal padding
    else:
        block_q = 512
        sp = _ceil_to(s, block_q)

    def prep(x):
        x = x.reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))

    qf, kf, vf = prep(q), prep(k), prep(v)
    ktf = jnp.swapaxes(kf, 1, 2)      # (BH, D, Sp) — see _fa_kernel docstring
    n_q = sp // block_q

    # Interpret mode makes the kernel runnable on the CPU test mesh
    # (XLA_FLAGS=--xla_force_host_platform_device_count=8), the JAX-native
    # "fake backend" this repo uses in place of real multi-chip hardware.
    interpret = jax.default_backend() != "tpu"

    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, causal=causal,
                          seq_len=s, block_q=block_q, dropout_rate=dropout_rate),
        grid=(b * h, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, sp), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, iq: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sp * sp * d,
            bytes_accessed=(3 * b * h * sp * d + b * h * sp * d) * q.dtype.itemsize,
            transcendentals=b * h * sp * sp,
        ),
        interpret=interpret,
    )(qf, ktf, vf, seed)
    return out[:, :s, :].reshape(b, h, s, d)


def _fa_bwd_kernel(q_ref, kt_ref, v_ref, do_ref, seed_ref, dq_ref, dk_ref,
                   dv_ref, *, scale: float, causal: bool, seq_len: int,
                   dropout_rate: float):
    """Fused attention backward, one (batch, head) per program; full sequence in
    VMEM (profile-driven: the XLA rematerialized backward ran at ~28 TF/s because
    every (S,S) intermediate round-tripped HBM; here p/dp/ds never leave VMEM).

    Shapes: q/v/do (1, Sp, D), kᵀ (1, D, Sp) → dq/dk/dv (1, Sp, D).
    Math (flash-attention backward with recomputed probabilities):
      p  = softmax(mask(q·kᵀ·scale))
      dv = pᵀ·do
      dp = do·vᵀ
      ds = p ∘ (dp − rowsum(p ∘ dp)) · scale
      dq = ds·k ;  dk = dsᵀ·q
    Zero-padded do rows / masked key columns make all padding gradients vanish
    exactly (exp(finfo.min − m) underflows to 0).
    """
    q = q_ref[0]                       # (Sp, D)
    kt = kt_ref[0]                     # (D, Sp)
    v = v_ref[0]                       # (Sp, D)
    do = do_ref[0]                     # (Sp, D)
    sp = q.shape[0]

    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), dimension=1)
    valid = col < seq_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), dimension=0)
        valid = jnp.logical_and(valid, col <= row)
    s = jnp.where(valid, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l                          # true probabilities (Sp, Sp) fp32

    if dropout_rate > 0.0:
        # regenerate the forward mask (same seed + program id)
        dmask = _dropout_mask(seed_ref, (sp, sp), dropout_rate)
        p_eff = p * dmask              # p̃ = D∘p_norm, the effective forward probs
    else:
        p_eff = p
    pc = p_eff.astype(v.dtype)
    dv = jax.lax.dot_general(jnp.swapaxes(pc, 0, 1), do,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32, precision=prec)
    dp = jax.lax.dot_general(do, jnp.swapaxes(v, 0, 1),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32, precision=prec)
    if dropout_rate > 0.0:
        dp = dp * dmask                # dL/dp_norm = D∘(do·vᵀ)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq = jax.lax.dot_general(ds, jnp.swapaxes(kt, 0, 1),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32, precision=prec)
    dk = jax.lax.dot_general(jnp.swapaxes(ds, 0, 1), q,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32, precision=prec)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# VMEM budget for the single-program backward: p/dp/ds are (Sp, Sp) fp32.
_MAX_FUSED_BWD_SEQ = 768


def _flash_attention_bwd_impl(q, k, v, g, seed, causal: bool,
                              dropout_rate: float):
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    sp = _ceil_to(s, _SUBLANE)

    def prep(x):
        x = x.reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))

    qf, kf, vf, gf = prep(q), prep(k), prep(v), prep(g)
    ktf = jnp.swapaxes(kf, 1, 2)
    interpret = jax.default_backend() != "tpu"

    spec = pl.BlockSpec((1, sp, d), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM)
    kt_spec = pl.BlockSpec((1, d, sp), lambda bh: (bh, 0, 0),
                           memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_fa_bwd_kernel, scale=scale, causal=causal, seq_len=s,
                          dropout_rate=dropout_rate),
        grid=(b * h,),
        in_specs=[spec, kt_spec, spec, spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(spec, spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct((b * h, sp, d), q.dtype)
                        for _ in range(3)),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * sp * sp * d,
            bytes_accessed=7 * b * h * sp * d * q.dtype.itemsize,
            transcendentals=b * h * sp * sp,
        ),
        interpret=interpret,
    )(qf, ktf, vf, gf, seed)

    def unprep(x):
        return x[:, :s, :].reshape(b, h, s, d)

    return unprep(dq), unprep(dk), unprep(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention(q, k, v, seed, causal, dropout_rate):
    return _flash_attention_fwd_impl(q, k, v, seed, causal, dropout_rate)


def _fa_fwd(q, k, v, seed, causal, dropout_rate):
    return (_flash_attention_fwd_impl(q, k, v, seed, causal, dropout_rate),
            (q, k, v, seed))


def _fa_bwd(causal, dropout_rate, res, g):
    import numpy as np

    q, k, v, seed = res
    seed_grad = np.zeros(seed.shape, jax.dtypes.float0)
    if q.shape[-2] > _MAX_FUSED_BWD_SEQ:
        # Rematerialized XLA backward for long sequences (VMEM bound; the fused
        # kernel also loses to XLA here — measured at S=1024). Dropout never takes
        # this branch (fused dropout is gated to single-q-block sizes).
        assert dropout_rate == 0.0
        _, vjp = jax.vjp(lambda q_, k_, v_: attention_xla(q_, k_, v_, causal=causal),
                         q, k, v)
        return (*vjp(g), seed_grad)
    dq, dk, dv = _flash_attention_bwd_impl(q, k, v, g, seed, causal, dropout_rate)
    return dq, dk, dv, seed_grad


_flash_attention.defvjp(_fa_fwd, _fa_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = False, dropout_rate: float = 0.0,
                    dropout_rng: "jax.Array | None" = None) -> jax.Array:
    """Fused attention. q,k,v: (B, H, S, D) -> (B, H, S, D).

    dropout_rate > 0 applies in-kernel dropout to the attention probabilities
    (requires dropout_rng; supported when S fits one q block, i.e. S ≤ 512 —
    otherwise the caller should use the XLA path)."""
    s = q.shape[-2]
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        if s > 512 or s > _MAX_FUSED_BWD_SEQ:
            return attention_xla(q, k, v, causal=causal,
                                 dropout_rate=dropout_rate,
                                 dropout_rng=dropout_rng)
        seed = jax.random.randint(dropout_rng, (1,), 0, 2 ** 31 - 1, jnp.int32)
        return _flash_attention(q, k, v, seed, causal, dropout_rate)
    if s > _MAX_FUSED_SEQ:
        return attention_xla(q, k, v, causal=causal)
    seed = jnp.zeros((1,), jnp.int32)
    return _flash_attention(q, k, v, seed, causal, 0.0)
