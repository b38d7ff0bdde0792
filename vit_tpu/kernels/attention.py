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
keeps every (S,S) intermediate in VMEM; beyond _MAX_FUSED_BWD_SEQ a q-block-tiled
Pallas backward takes over (_fa_bwd_tiled_kernel: per-program dk/dv partials reduced
by XLA — covers VideoGPT's S=1024 default), with an XLA rematerialized fallback
behind VIT_TPU_TILED_BWD=0 (no residuals besides q,k,v on any path).
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


def _dropout_mask(seed_ref, hid, shape, rate: float, row0=0,
                  stride: "int | None" = None):
    """Deterministic per-(batch·head) dropout keep-mask scaled by 1/keep (fp32).

    Counter-based (murmur3-finalizer over position iota ⊕ seed ⊕ head id) rather
    than pltpu.prng_* so the identical stream exists in compiled AND interpret mode
    (CPU tests) and the backward kernel regenerates it exactly. ``hid`` (flat
    batch·head index) identifies the stream. The hash runs over GLOBAL LOGICAL
    coordinates: ``row0`` is the global row of the block's first query and
    ``stride`` the LOGICAL sequence length — the forward pads to a q-block
    multiple while the backward pads to a sublane multiple, so hashing the
    padded width would give the two passes different streams for
    512 < S ≤ 768 (padded positions hash to don't-care values: they are
    score-masked to zero probability anyway)."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(row0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = r * jnp.uint32(stride if stride is not None else shape[1]) + c
    x = x ^ (seed_ref[0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    x = x + hid.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    keep = x >= jnp.uint32(int(rate * 0xFFFFFFFF))
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _fa_kernel(q_ref, k_ref, v_ref, seed_ref, o_ref, *, scale: float,
               causal: bool, seq_len: int, block_q: int, dropout_rate: float,
               local_heads: int = 0, global_heads: int = 0):
    """One q-block of fused attention. Shapes: q (1,BQ,D), k/v (1,Sp,D),
    o (1,BQ,D). The QKᵀ contraction is dim-1×dim-1 against the UNTRANSPOSED k
    (Mosaic accepts it for bf16 and fp32 — probed on-chip; the historical HBM
    pre-transpose it replaces cost a full K round-trip). A power-of-two
    1/sqrt(d) folds into q, bit-exact (exponent arithmetic). With dropout_rate>0
    the post-softmax probabilities are dropped in-kernel (torch SDPA semantics,
    reference transformer.py:28) using the on-core PRNG."""
    iq = pl.program_id(1)
    q = q_ref[0]                      # (BQ, D)
    k = k_ref[0]                      # (Sp, D)
    v = v_ref[0]                      # (Sp, D)
    sp = k.shape[0]
    bq = q.shape[0]

    # fp32 inputs get true-fp32 matmuls (multi-pass); bf16 inputs use the native
    # single-pass MXU path (Mosaic rejects forced-fp32 contraction of bf16 operands).
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    scale_pow2 = scale == 2.0 ** round(math.log2(scale))
    if scale_pow2:
        q = q * jnp.asarray(scale, q.dtype)
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )                                  # (BQ, Sp) fp32
    if not scale_pow2:
        s = s * scale

    # Masking is skipped when every key is valid (no padding, dense): at the
    # flagship S=320 the mask build+apply is pure constant-true VPU work.
    # seq_len/sp are static at trace time.
    if causal or seq_len < sp:
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, sp), dimension=1)
        valid = col < seq_len          # mask key padding
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (bq, sp), dimension=0)
            valid = jnp.logical_and(valid, col <= row + iq * block_q)
        s = jnp.where(valid, s, jnp.finfo(jnp.float32).min)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)                 # masked entries: exp(neg - m) ≈ 0
    l = jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        # D∘(p/l) = (D∘p)/l — drop before the PV matmul, keep the normalizer.
        # Stream id is the GLOBAL (batch, head) index: program id decomposed
        # with the LOCAL head count, recomposed with the GLOBAL one, plus the
        # shard offset in seed_ref[1] — so batch/head shards under pjit get
        # the same streams the single-device run would (see *_cp lowers).
        pid0 = pl.program_id(0)
        hid = ((pid0 // local_heads) * global_heads + pid0 % local_heads
               + seed_ref[1])
        p = p * _dropout_mask(seed_ref, hid, (bq, sp), dropout_rate,
                              row0=iq * block_q, stride=seq_len)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) / l
    o_ref[0] = o.astype(o_ref.dtype)


def _seed_vec(seed, hid_off):
    """(2,) SMEM vector [seed, stream offset] — the offset is 0 except inside a
    sharded custom_partitioning lower, where it maps local (batch, head) program
    ids onto the single-device stream-id space."""
    return jnp.concatenate([
        seed.astype(jnp.int32).reshape(1),
        jnp.asarray(hid_off, jnp.int32).reshape(1)])


def _flash_attention_fwd_impl(q, k, v, seed, causal: bool,
                              dropout_rate: float, hid_off=0,
                              global_heads: "int | None" = None):
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
    n_q = sp // block_q

    # Interpret mode makes the kernel runnable on the CPU test mesh
    # (XLA_FLAGS=--xla_force_host_platform_device_count=8), the JAX-native
    # "fake backend" this repo uses in place of real multi-chip hardware.
    interpret = jax.default_backend() != "tpu"

    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, causal=causal,
                          seq_len=s, block_q=block_q, dropout_rate=dropout_rate,
                          local_heads=h,
                          global_heads=(global_heads
                                        if global_heads is not None else h)),
        grid=(b * h, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda bh, iq: (bh, 0, 0),
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
    )(qf, kf, vf, _seed_vec(seed, hid_off))
    return out[:, :s, :].reshape(b, h, s, d)


def _fa_bwd_kernel(q_ref, k_ref, v_ref, do_ref, seed_ref, dq_ref, dk_ref,
                   dv_ref, *, scale: float, causal: bool, seq_len: int,
                   dropout_rate: float, local_heads: int = 0,
                   global_heads: int = 0):
    """Fused attention backward, one (batch, head) per program; full sequence in
    VMEM (profile-driven: the XLA rematerialized backward ran at ~28 TF/s because
    every (S,S) intermediate round-tripped HBM; here p/dp/ds never leave VMEM).

    Shapes: q/k/v/do (1, Sp, D) → dq/dk/dv (1, Sp, D); all contractions use
    dot_general dimension numbers directly (no materialized transposes), and a
    pow2 1/sqrt(d) folds into the scores-side q (bit-exact; dq/dk keep their
    single scale factor through ds, which contracts the UNSCALED q for dk).
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
    k = k_ref[0]                       # (Sp, D)
    v = v_ref[0]                       # (Sp, D)
    do = do_ref[0]                     # (Sp, D)
    sp = q.shape[0]

    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    scale_pow2 = scale == 2.0 ** round(math.log2(scale))
    qs = q * jnp.asarray(scale, q.dtype) if scale_pow2 else q
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    if not scale_pow2:
        s = s * scale
    if causal or seq_len < sp:         # skip all-true masks (see _fa_kernel)
        col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), dimension=1)
        valid = col < seq_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), dimension=0)
            valid = jnp.logical_and(valid, col <= row)
        s = jnp.where(valid, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    ph = jnp.exp(s - m)                # unnormalized probabilities (Sp, Sp) fp32
    l = jnp.sum(ph, axis=-1, keepdims=True)
    linv = 1.0 / l                     # (Sp, 1)
    # The 1/l normalization is folded out of the (Sp,Sp) plane: an (Sp,Sp) fp32
    # divide is multi-cycle VPU work (measured −0.18 ms/call on the flagship
    # packed shape); dv gets it via do/l along the contraction, ds via a row
    # broadcast. Same math: p_norm = ph/l, delta = deltah/l.
    if dropout_rate > 0.0:
        # regenerate the forward mask (same seed + global stream id)
        pid0 = pl.program_id(0)
        hid = ((pid0 // local_heads) * global_heads + pid0 % local_heads
               + seed_ref[1])
        dmask = _dropout_mask(seed_ref, hid, (sp, sp), dropout_rate,
                              stride=seq_len)
        ph_eff = ph * dmask            # D∘ph — normalization folded into do below
    else:
        ph_eff = ph
    pc = ph_eff.astype(v.dtype)
    dol = (do.astype(jnp.float32) * linv).astype(v.dtype)
    dv = jax.lax.dot_general(pc, dol, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32, precision=prec)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32, precision=prec)
    if dropout_rate > 0.0:
        dp = dp * dmask                # dL/dp_norm = D∘(do·vᵀ)
    deltah = jnp.sum(ph * dp, axis=-1, keepdims=True)
    ds = (ph * ((dp - deltah * linv) * (scale * linv))).astype(q.dtype)
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32, precision=prec)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32, precision=prec)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# VMEM budget for the single-program backward: p/dp/ds are (Sp, Sp) fp32.
_MAX_FUSED_BWD_SEQ = 768


def _fa_bwd_tiled_kernel(q_ref, k_ref, v_ref, do_ref, seed_ref, dq_ref,
                         dkp_ref, dvp_ref, *, scale: float, causal: bool,
                         seq_len: int, block_q: int, dropout_rate: float,
                         local_heads: int, global_heads: int):
    """q-block-tiled attention backward for long sequences (VideoGPT's S=1024,
    reference train_videogpt.py:26-27). One (batch·head, q-block) per program;
    same math as _fa_bwd_kernel restricted to the block's query rows, with
    dk/dv emitted as PER-PROGRAM PARTIALS reduced by XLA afterwards — the
    round-2 negative result showed accumulating into a grid-resident dk/dv
    block serializes the whole grid (BENCHMARKS.md), while per-program partials
    + XLA reduce was already the winning pattern for the qkv-bias gradient.

    Shapes: q/do/dq (1,BQ,D); k/v (1,Sp,D); dkp/dvp (1,Sp,D) at
    block row (bh·n_q + iq) of a (BH·n_q, Sp, D) partials array. m/l are
    recomputed from the block's own (BQ,Sp) score plane — no saved-lse pass
    needed because the full key range is resident per program. Contractions
    use dimension numbers directly (no transposes); pow2 scale folds into the
    scores-side q (see _fa_bwd_kernel)."""
    iq = pl.program_id(1)
    q = q_ref[0]                       # (BQ, D)
    k = k_ref[0]                       # (Sp, D)
    v = v_ref[0]                       # (Sp, D)
    do = do_ref[0]                     # (BQ, D)
    sp = k.shape[0]
    bq = q.shape[0]

    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    scale_pow2 = scale == 2.0 ** round(math.log2(scale))
    qs = q * jnp.asarray(scale, q.dtype) if scale_pow2 else q
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    if not scale_pow2:
        s = s * scale
    if causal or seq_len < sp:
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, sp), dimension=1)
        valid = col < seq_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (bq, sp), dimension=0)
            valid = jnp.logical_and(valid, col <= row + iq * block_q)
        s = jnp.where(valid, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    ph = jnp.exp(s - m)
    l = jnp.sum(ph, axis=-1, keepdims=True)
    linv = 1.0 / l
    if dropout_rate > 0.0:
        pid0 = pl.program_id(0)
        hid = ((pid0 // local_heads) * global_heads + pid0 % local_heads
               + seed_ref[1])
        dmask = _dropout_mask(seed_ref, hid, (bq, sp), dropout_rate,
                              row0=iq * block_q, stride=seq_len)
        ph_eff = ph * dmask
    else:
        ph_eff = ph
    pc = ph_eff.astype(v.dtype)
    dol = (do.astype(jnp.float32) * linv).astype(v.dtype)
    dvp = jax.lax.dot_general(pc, dol, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
    if dropout_rate > 0.0:
        dp = dp * dmask
    deltah = jnp.sum(ph * dp, axis=-1, keepdims=True)
    ds = (ph * ((dp - deltah * linv) * (scale * linv))).astype(q.dtype)
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32, precision=prec)
    dkp = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dkp_ref[0] = dkp.astype(dkp_ref.dtype)
    dvp_ref[0] = dvp.astype(dvp_ref.dtype)


def _tiled_bwd_blocking(s: int, dropout: bool):
    """(block_q, sp, n_q) under a ~10 MB scoped-VMEM plane budget: up to 4 (5
    with dropout) live (BQ, Sp) fp32 planes per program."""
    planes = 5 if dropout else 4
    budget = 10 * 1024 * 1024
    for bq_max in (512, 256, 128, 64):
        n_q = -(-s // bq_max)
        block_q = _ceil_to(-(-s // n_q), _SUBLANE)
        sp = n_q * block_q
        if planes * 4 * block_q * sp <= budget:
            return block_q, sp, n_q
    return None


def _flash_attention_bwd_tiled_impl(q, k, v, g, seed, causal: bool,
                                    dropout_rate: float, hid_off=0,
                                    global_heads: "int | None" = None):
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    block_q, sp, n_q = _tiled_bwd_blocking(s, dropout_rate > 0.0)

    def prep(x):
        x = x.reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))

    qf, kf, vf, gf = prep(q), prep(k), prep(v), prep(g)
    interpret = jax.default_backend() != "tpu"

    blk_spec = pl.BlockSpec((1, block_q, d), lambda bh, iq: (bh, iq, 0),
                            memory_space=pltpu.VMEM)
    seq_spec = pl.BlockSpec((1, sp, d), lambda bh, iq: (bh, 0, 0),
                            memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((1, sp, d),
                             lambda bh, iq, n_q=n_q: (bh * n_q + iq, 0, 0),
                             memory_space=pltpu.VMEM)
    dq, dkp, dvp = pl.pallas_call(
        functools.partial(_fa_bwd_tiled_kernel, scale=scale, causal=causal,
                          seq_len=s, block_q=block_q,
                          dropout_rate=dropout_rate, local_heads=h,
                          global_heads=(global_heads
                                        if global_heads is not None else h)),
        grid=(b * h, n_q),
        in_specs=[blk_spec, seq_spec, seq_spec, blk_spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(blk_spec, part_spec, part_spec),
        out_shape=(jax.ShapeDtypeStruct((b * h, sp, d), q.dtype),
                   jax.ShapeDtypeStruct((b * h * n_q, sp, d), jnp.float32),
                   jax.ShapeDtypeStruct((b * h * n_q, sp, d), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * sp * sp * d,
            bytes_accessed=(7 + 2 * n_q) * b * h * sp * d * q.dtype.itemsize,
            transcendentals=b * h * sp * sp,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, _seed_vec(seed, hid_off))

    # XLA reduces the per-q-block dk/dv partials (never serializes the grid)
    dk = dkp.reshape(b * h, n_q, sp, d).sum(axis=1).astype(q.dtype)
    dv = dvp.reshape(b * h, n_q, sp, d).sum(axis=1).astype(q.dtype)

    def unprep(x):
        return x[:, :s, :].reshape(b, h, s, d)

    return unprep(dq), unprep(dk), unprep(dv)


def _flash_attention_bwd_impl(q, k, v, g, seed, causal: bool,
                              dropout_rate: float, hid_off=0,
                              global_heads: "int | None" = None):
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    sp = _ceil_to(s, _SUBLANE)

    def prep(x):
        x = x.reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))

    qf, kf, vf, gf = prep(q), prep(k), prep(v), prep(g)
    interpret = jax.default_backend() != "tpu"

    spec = pl.BlockSpec((1, sp, d), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_fa_bwd_kernel, scale=scale, causal=causal, seq_len=s,
                          dropout_rate=dropout_rate, local_heads=h,
                          global_heads=(global_heads
                                        if global_heads is not None else h)),
        grid=(b * h,),
        in_specs=[spec, spec, spec, spec,
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
    )(qf, kf, vf, gf, _seed_vec(seed, hid_off))

    def unprep(x):
        return x[:, :s, :].reshape(b, h, s, d)

    return unprep(dq), unprep(dk), unprep(dv)


# --- GSPMD partitioning rules -----------------------------------------------
#
# pallas_call is an opaque custom call GSPMD cannot split — round 1 had to force
# attn_impl="xla" on the pjit (fsdp/tp) path. These custom_partitioning wrappers
# declare batch (and head, for the unpacked layout) dims shardable; everything
# else is replicated per shard and GSPMD inserts any reshards. The kernels then
# run on local shard shapes inside one pjit program, composing with fsdp/tp
# parameter sharding. In-kernel dropout streams are GLOBAL (batch, head) ids:
# each lower adds its shard's offset (_partition.dim_offset via lax.axis_index)
# to the stream id, so the sharded run reproduces the single-device masks
# exactly (pinned by tests/test_parallel.py::test_pjit_dropout_streams_global).

from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402

from vit_tpu.kernels._partition import dim_offset, lead_spec, named  # noqa: E402


@functools.lru_cache(maxsize=None)
def _unpacked_fwd_cp(causal: bool, dropout_rate: float):
    @custom_partitioning
    def fwd(q, k, v, seed):
        return _flash_attention_fwd_impl(q, k, v, seed, causal, dropout_rate)

    def infer(mesh, arg_infos, result_infos):
        b, h = lead_spec(arg_infos[0], 2)
        return named(mesh, b, h, None, None)

    def part(mesh, arg_infos, result_infos):
        b, h = lead_spec(arg_infos[0], 2)
        gh = arg_infos[0].shape[1]          # GLOBAL head count
        qkv_sh = named(mesh, b, h, None, None)
        arg_sh = (qkv_sh, qkv_sh, qkv_sh, named(mesh, None))

        def lower(q, k, v, seed):
            # dropout streams: global (batch, head) ids regardless of sharding
            hid_off = (dim_offset(mesh, b, q.shape[0]) * gh
                       + dim_offset(mesh, h, q.shape[1]))
            return _flash_attention_fwd_impl(q, k, v, seed, causal, dropout_rate,
                                             hid_off=hid_off, global_heads=gh)

        return mesh, lower, qkv_sh, arg_sh

    fwd.def_partition(partition=part, infer_sharding_from_operands=infer,
                      sharding_rule="b h s d, b h t d, b h t d, u -> b h s d")
    return fwd


@functools.lru_cache(maxsize=None)
def _unpacked_bwd_cp(causal: bool, dropout_rate: float, tiled: bool = False):
    impl = (_flash_attention_bwd_tiled_impl if tiled
            else _flash_attention_bwd_impl)

    @custom_partitioning
    def bwd(q, k, v, g, seed):
        return impl(q, k, v, g, seed, causal, dropout_rate)

    def infer(mesh, arg_infos, result_infos):
        b, h = lead_spec(arg_infos[0], 2)
        s = named(mesh, b, h, None, None)
        return (s, s, s)

    def part(mesh, arg_infos, result_infos):
        b, h = lead_spec(arg_infos[0], 2)
        gh = arg_infos[0].shape[1]          # GLOBAL head count
        s = named(mesh, b, h, None, None)
        arg_sh = (s, s, s, s, named(mesh, None))

        def lower(q, k, v, g, seed):
            hid_off = (dim_offset(mesh, b, q.shape[0]) * gh
                       + dim_offset(mesh, h, q.shape[1]))
            return impl(q, k, v, g, seed, causal,
                        dropout_rate, hid_off=hid_off,
                        global_heads=gh)

        return mesh, lower, (s, s, s), arg_sh

    bwd.def_partition(
        partition=part, infer_sharding_from_operands=infer,
        sharding_rule=("b h s d, b h t d, b h t d, b h s d, u "
                       "-> b h s d, b h t d, b h t d"))
    return bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention(q, k, v, seed, causal, dropout_rate):
    return _unpacked_fwd_cp(causal, dropout_rate)(q, k, v, seed)


def _fa_fwd(q, k, v, seed, causal, dropout_rate):
    return (_unpacked_fwd_cp(causal, dropout_rate)(q, k, v, seed),
            (q, k, v, seed))


def _tiled_bwd_enabled() -> bool:
    import os

    return os.environ.get("VIT_TPU_TILED_BWD", "1") != "0"


def _fa_bwd(causal, dropout_rate, res, g):
    import numpy as np

    q, k, v, seed = res
    seed_grad = np.zeros(seed.shape, jax.dtypes.float0)
    s = q.shape[-2]
    if s > _MAX_FUSED_BWD_SEQ:
        # Beyond the single-program VMEM bound: q-block-tiled Pallas backward
        # with per-program dk/dv partials reduced by XLA (the round-2
        # revisited-accumulator variant that LOST to XLA is documented in
        # BENCHMARKS.md — partials avoid its grid serialization).
        # VIT_TPU_TILED_BWD=0 restores the XLA rematerialized fallback.
        if _tiled_bwd_enabled() and \
                _tiled_bwd_blocking(s, dropout_rate > 0.0) is not None:
            dq, dk, dv = _unpacked_bwd_cp(causal, dropout_rate, True)(
                q, k, v, g, seed)
            return dq, dk, dv, seed_grad
        assert dropout_rate == 0.0
        _, vjp = jax.vjp(lambda q_, k_, v_: attention_xla(q_, k_, v_, causal=causal),
                         q, k, v)
        return (*vjp(g), seed_grad)
    dq, dk, dv = _unpacked_bwd_cp(causal, dropout_rate)(q, k, v, g, seed)
    return dq, dk, dv, seed_grad


_flash_attention.defvjp(_fa_fwd, _fa_bwd)


# ---------------------------------------------------------------------------
# Packed-QKV attention: consumes the fused QKV projection output directly.
#
# Profile-driven (round 2): routing the (B, S, 3D) QKV matmul output through
# rearrange("b n (three h d) -> three b h n d") cost ~0.7 ms/layer of XLA layout
# copies + head-split fusions on the flagship step (≈30 ms data formatting +
# a similar share of loop fusion per profile). Here the head split is done by
# BlockSpecs instead: the kernel reads qkv reshaped (B, S, 3, D) with one
# 128-lane column block per head PAIR (head_dim 64 — all S/B/L presets), and
# writes (B, S, D) directly, so the surrounding matmuls see zero glue.
# The backward emits dqkv as (B, S, 3, D), whose flat layout bit-matches the
# packed (B, S, 3D) — the final reshape is free.
# ---------------------------------------------------------------------------

_LANES = 128


def packed_supported(n_heads: int, n_embd: int, seq_len: int,
                     dropout_rate: float = 0.0) -> bool:
    """Head pairs must tile the 128-lane dim; fused bwd bounds the seq length."""
    if n_embd % n_heads:
        return False
    d = n_embd // n_heads
    if _LANES % d or n_embd % _LANES:
        return False
    if seq_len > _MAX_FUSED_BWD_SEQ:
        return False
    return True


def _fa_packed_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref,
                      *maybe_stats_ref, scale: float, causal: bool,
                      seq_len: int, block_q: int, dropout_rate: float,
                      head_dim: int, n_heads: int, bb: int, has_bias: bool,
                      emit_stats: bool = False):
    """One q block × one 128-lane head-pair block × ``bb`` batch elements.
    q_ref (bb,BQ,L), k_ref/v_ref (bb,Sp,L) — three column-block views into the
    flat (B,Sp,3D) qkv; o_ref (bb,BQ,L); L=128.

    Head (and batch-sub-block) stages are BATCHED — all units' QKᵀ, then all
    softmaxes, then all PV — rather than run unit-by-unit: adjacent independent
    MXU/VPU phases let the compiler overlap the matrix and vector units. With
    bb=2 there are 4 independent streams per program and half as many programs:
    measured 0.61 (sequential) → 0.56 (staged) → 0.49 ms/call (staged, bb=2) on
    the flagship shape. Gated by VMEM: staging keeps bb·hb (BQ,Sp) fp32 planes
    live (bb chosen in the impl; bb=2 only for Sp ≤ 384 — bb=4 at Sp=320
    measured 24.2 MB of scoped VMEM, over the 16 MB budget)."""
    pid_b = pl.program_id(0)
    h2 = pl.program_id(1)
    iq = pl.program_id(2)
    sp = k_ref.shape[1]
    bq = q_ref.shape[1]
    hb = _LANES // head_dim
    prec = jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32 else None

    need_mask = causal or seq_len < sp  # static; skip all-true masks
    if need_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, sp), dimension=1)
        valid = col < seq_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (bq, sp), dimension=0)
            valid = jnp.logical_and(valid, col <= row + iq * block_q)
    neg = jnp.finfo(jnp.float32).min

    # With has_bias the three 128-lane blocks are the UNBIASED projection; the
    # qkv bias segments are added here in VMEM so the backward can emit the bias
    # gradient without XLA re-reading the (B,S,3D) dqkv just to column-sum it.
    h2n = n_heads * head_dim // _LANES
    # When 1/sqrt(d) is a power of two (d=64 → 1/8: every MHA shape this kernel
    # serves) fold it into q up front: one (BQ,L) low-precision multiply per
    # batch row instead of a (BQ,Sp) fp32 pass per unit — bit-exact, since
    # pow2 scaling of a float is exponent arithmetic (no mantissa rounding).
    scale_pow2 = scale == 2.0 ** round(math.log2(scale))
    units = []                             # (bi, j, q, kt, v)
    for bi in range(bb):
        qp, kp, vp = q_ref[bi], k_ref[bi], v_ref[bi]
        if has_bias:
            # bias_ref is (8, 3D) (row 0 live): Mosaic proves 128-multiple
            # dynamic LANE slices on ≥2-D refs, but rejects them on 1-D vectors.
            qp = qp + bias_ref[0, pl.ds(h2 * _LANES, _LANES)].astype(qp.dtype)
            kp = kp + bias_ref[0, pl.ds((h2n + h2) * _LANES,
                                        _LANES)].astype(kp.dtype)
            vp = vp + bias_ref[0, pl.ds((2 * h2n + h2) * _LANES,
                                        _LANES)].astype(vp.dtype)
        if scale_pow2:
            qp = qp * jnp.asarray(scale, qp.dtype)
        for j in range(hb):
            lo = j * head_dim
            units.append((bi, j, qp[:, lo:lo + head_dim],
                          kp[:, lo:lo + head_dim], vp[:, lo:lo + head_dim]))

    staged = bb * bq * sp <= 512 * 512

    def scores(u):
        _, _, q, k, _ = u
        # contract dim1×dim1 (k untransposed): Mosaic feeds the MXU's
        # stationary operand from the (Sp, D) layout directly
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        if not scale_pow2:
            s = s * scale
        if need_mask:
            s = jnp.where(valid, s, neg)
        return s

    def softmax(u, s):
        bi, j, _, _, v = u
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            # seed_ref[1]: batch-shard offset (× n_heads) so pjit batch shards
            # reproduce the single-device streams
            hid = (pid_b * bb + bi) * n_heads + h2 * hb + j + seed_ref[1]
            p = p * _dropout_mask(seed_ref, hid, (bq, sp), dropout_rate,
                                  row0=iq * block_q, stride=seq_len)
        return p.astype(v.dtype), l, m

    def pv(u, p, l):
        return jax.lax.dot_general(p, u[4], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec) / l

    if staged:
        ss = [scores(u) for u in units]
        pls = [softmax(u, s) for u, s in zip(units, ss)]
        outs = [pv(u, p, l) for u, (p, l, _) in zip(units, pls)]
    else:
        pls = []
        outs = []
        for u in units:
            p, l, m = softmax(u, scores(u))
            pls.append((p, l, m))
            outs.append(pv(u, p, l))
    for bi in range(bb):
        o_ref[bi] = jnp.concatenate(outs[bi * hb:(bi + 1) * hb],
                                    axis=1).astype(o_ref.dtype)
    if emit_stats:
        # (m, l) residuals for the backward (VERDICT r4 next #2): skipping the
        # bwd's row max/sum recompute measured −20% on the bwd call. Layout:
        # one f32 (1, bb, BQ, 128) block per (h2, b, iq) — unit j's m
        # replicated over lanes [j·8, j·8+8), its l over [64+j·8, ...). The
        # 8-wide replication lets the backward recover the (BQ, 1) column with
        # a cheap all-equal 8-lane max instead of a width-1 lane slice.
        (stats_ref,) = maybe_stats_ref
        for u, (_, l, m) in zip(units, pls):
            bi, j = u[0], u[1]
            stats_ref[0, bi, :, j * 8:(j + 1) * 8] = jnp.broadcast_to(
                m, (bq, 8))
            stats_ref[0, bi, :, 64 + j * 8:64 + (j + 1) * 8] = (
                jnp.broadcast_to(l, (bq, 8)))


def _packed_fwd_impl(qkv, seed, n_heads: int, causal: bool, dropout_rate: float,
                     bias=None, hid_off=0, emit_stats: bool = False):
    b, s, three_d = qkv.shape
    n_embd = three_d // 3
    d = n_embd // n_heads
    scale = 1.0 / math.sqrt(d)
    h2 = n_embd // _LANES
    if s <= 512:
        block_q = sp = _ceil_to(s, _SUBLANE)
    else:
        block_q = 512
        sp = _ceil_to(s, block_q)
    x = qkv
    if sp != s:
        x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    n_q = sp // block_q
    interpret = jax.default_backend() != "tpu"

    # Column-block views into the flat (B, Sp, 3D) qkv: 3D = 3·h2 blocks of 128
    # lanes; q pair h at block h, k at h2+h, v at 2·h2+h. (Mosaic requires the
    # last two BLOCK dims divisible by (8, 128) — a 4D (B,S,3,D) view with a
    # unit block over the size-3 axis is rejected, the flat layout is not.)
    # bb=2 batch elements per program where VMEM allows (see kernel docstring).
    # bb=4 was tried for the (lighter) forward too and measured WORSE
    # (0.585 vs 0.518 ms/call at the flagship shape — VMEM pressure degrades
    # the grid pipelining before any overlap gain shows).
    bb = 2 if (b % 2 == 0 and sp <= 384) else 1
    has_bias = bias is not None
    bias_arr = (jnp.broadcast_to(bias.astype(qkv.dtype), (_SUBLANE, three_d))
                if has_bias else jnp.zeros((_SUBLANE, three_d), qkv.dtype))
    out_specs = pl.BlockSpec((bb, block_q, _LANES),
                             lambda b, h, iq: (b, iq, h),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, sp, n_embd), qkv.dtype)
    if emit_stats:
        # (m, l) residuals, f32 (h2, B, Sp, 128): one block per (h2, b, iq),
        # written once (see kernel docstring for the lane layout)
        out_specs = (out_specs,
                     pl.BlockSpec((1, bb, block_q, _LANES),
                                  lambda b, h, iq: (h, b, iq, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((h2, b, sp, _LANES), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_fa_packed_kernel, scale=scale, causal=causal,
                          seq_len=s, block_q=block_q, dropout_rate=dropout_rate,
                          head_dim=d, n_heads=n_heads, bb=bb,
                          has_bias=has_bias, emit_stats=emit_stats),
        grid=(b // bb, h2, n_q),
        in_specs=[
            pl.BlockSpec((bb, block_q, _LANES), lambda b, h, iq: (b, iq, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, sp, _LANES),
                         lambda b, h, iq, h2=h2: (b, 0, h2 + h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, sp, _LANES),
                         lambda b, h, iq, h2=h2: (b, 0, 2 * h2 + h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, three_d), lambda b, h, iq: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_heads * sp * sp * d,
            bytes_accessed=4 * b * sp * n_embd * qkv.dtype.itemsize,
            transcendentals=b * n_heads * sp * sp,
        ),
        interpret=interpret,
    )(x, x, x, bias_arr, _seed_vec(seed, hid_off))
    if emit_stats:
        out, stats = out
        return (out[:, :s, :] if sp != s else out), stats
    return out[:, :s, :] if sp != s else out


def _fa_packed_bwd_kernel(q_ref, k_ref, v_ref, do_ref, bias_ref, seed_ref,
                          *rest_refs, scale: float, causal: bool,
                          seq_len: int, dropout_rate: float, head_dim: int,
                          n_heads: int, bb: int, has_bias: bool,
                          use_stats: bool = False):
    """One (batch sub-block, head-pair) per program; full sequence in VMEM.
    q/k/v (bb,Sp,L) flat-qkv column views, do (bb,Sp,L) → dqkv (bb,Sp,3D)
    written via 128-aligned dynamic lane stores into a block that is REVISITED
    across the inner head-pair grid dim (constant index map → stays
    VMEM-resident, one HBM writeback per batch row). Measured: a (B,S,3,D) 4-D
    output got a T(4,128) layout and cost 1.9× (147.9 → 79.0 ms on the flagship
    shape); three separate outputs + XLA concat was 1.26× (99.8 ms). Same math
    as _fa_bwd_kernel (incl. the folded-out 1/l normalization).

    Stage-batched across the bb·hb units so MXU matmul phases and VPU
    softmax/ds phases of different units overlap: 1.54 (sequential) → 1.28
    (staged) → 1.08 ms/call (staged, bb=2) at the flagship shape. VMEM gates:
    staging keeps up to 2·bb·hb (Sp,Sp) fp32 planes live; bb=2 only for
    Sp ≤ 384 (bb=4 at Sp=320 measured 24.2 MB scoped VMEM > 16 MB budget)."""
    rest = list(rest_refs)
    stats_ref = rest.pop(0) if use_stats else None
    dqkv_ref = rest.pop(0)
    maybe_db_ref = tuple(rest)
    pid_b = pl.program_id(0)
    h2 = pl.program_id(1)
    sp = q_ref.shape[1]
    hb = _LANES // head_dim
    prec = jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32 else None

    need_mask = causal or seq_len < sp  # static; skip all-true masks
    if need_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), dimension=1)
        valid = col < seq_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), dimension=0)
            valid = jnp.logical_and(valid, col <= row)
    neg = jnp.finfo(jnp.float32).min

    h2n_ = (n_heads * head_dim) // _LANES
    # pow2 scale folds into the scores-side q (bit-exact, see fwd kernel);
    # dq/dk keep their single `scale` factor via dscore's (scale·linv) term,
    # and dk contracts against the UNSCALED q — gradients unchanged.
    scale_pow2 = scale == 2.0 ** round(math.log2(scale))
    units = []                             # (bi, j, qs, q, k, v, do)
    for bi in range(bb):
        qp, kp, vp, dop = q_ref[bi], k_ref[bi], v_ref[bi], do_ref[bi]
        if has_bias:                       # unbiased views + in-VMEM bias add
            qp = qp + bias_ref[0, pl.ds(h2 * _LANES, _LANES)].astype(qp.dtype)
            kp = kp + bias_ref[0, pl.ds((h2n_ + h2) * _LANES,
                                        _LANES)].astype(kp.dtype)
            vp = vp + bias_ref[0, pl.ds((2 * h2n_ + h2) * _LANES,
                                        _LANES)].astype(vp.dtype)
        qsp = qp * jnp.asarray(scale, qp.dtype) if scale_pow2 else qp
        for j in range(hb):
            lo = j * head_dim
            units.append((bi, j, qsp[:, lo:lo + head_dim],
                          qp[:, lo:lo + head_dim], kp[:, lo:lo + head_dim],
                          vp[:, lo:lo + head_dim], dop[:, lo:lo + head_dim]))

    # Dropout keeps an extra (Sp,Sp) fp32 mask alive per unit: at Sp=640 the
    # staged form measured 16.48 MB scoped VMEM (492 KB over budget) — fall
    # back to the sequential loop there.
    staged = bb * sp <= 2 * 512 and (dropout_rate == 0.0 or sp <= 512)

    def scores(u):
        _, _, qs, _, k, _, _ = u
        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        if not scale_pow2:
            s = s * scale
        if need_mask:
            s = jnp.where(valid, s, neg)
        return s

    def softmax(u, s):
        bi, j = u[0], u[1]
        if use_stats:
            # (m, l) saved by the forward (same recomputed scores → bit-exact;
            # lane layout in _fa_packed_kernel). Skipping the (Sp,Sp) row
            # max/sum reductions measured −20% on this kernel standalone. The
            # 8-wide replicated lanes collapse to a (Sp,1) column with a cheap
            # all-equal max instead of a width-1 lane slice.
            sl = stats_ref[0, bi]
            m = jnp.max(sl[:, j * 8:(j + 1) * 8], axis=-1, keepdims=True)
            l = jnp.max(sl[:, 64 + j * 8:64 + (j + 1) * 8],
                        axis=-1, keepdims=True)
            ph = jnp.exp(s - m)
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            ph = jnp.exp(s - m)        # unnormalized; see _fa_bwd_kernel note
            l = jnp.sum(ph, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            hid = (pid_b * bb + bi) * n_heads + h2 * hb + j + seed_ref[1]
            dmask = _dropout_mask(seed_ref, hid, (sp, sp), dropout_rate,
                                  stride=seq_len)
        else:
            dmask = None
        return ph, 1.0 / l, dmask

    def dv_dp(u, ph, linv, dmask):
        _, _, _, _, _, v, do = u
        ph_eff = ph if dmask is None else ph * dmask
        pc = ph_eff.astype(v.dtype)
        dol = (do.astype(jnp.float32) * linv).astype(v.dtype)
        dv = jax.lax.dot_general(pc, dol, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        if dmask is not None:
            dp = dp * dmask
        return dv, dp

    def dscore(u, ph, linv, dp):
        deltah = jnp.sum(ph * dp, axis=-1, keepdims=True)
        return (ph * ((dp - deltah * linv)
                      * (scale * linv))).astype(u[3].dtype)

    def dq_dk(u, ds):
        _, _, _, q, k, _, _ = u
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        return dq, dk

    if staged:
        sms = [softmax(u, scores(u)) for u in units]
        vps = [dv_dp(u, *sm) for u, sm in zip(units, sms)]
        dss = [dscore(u, sm[0], sm[1], vp_[1])
               for u, sm, vp_ in zip(units, sms, vps)]
        qks = [dq_dk(u, ds) for u, ds in zip(units, dss)]
        dqs = [qk[0] for qk in qks]
        dks = [qk[1] for qk in qks]
        dvs = [vp_[0] for vp_ in vps]
    else:
        dqs, dks, dvs = [], [], []
        for u in units:
            ph, linv, dmask = softmax(u, scores(u))
            dv, dp = dv_dp(u, ph, linv, dmask)
            dq, dk = dq_dk(u, dscore(u, ph, linv, dp))
            dqs.append(dq)
            dks.append(dk)
            dvs.append(dv)
    h2n = (n_heads * head_dim) // _LANES
    dq_cats, dk_cats, dv_cats = [], [], []
    for bi in range(bb):
        sl = slice(bi * hb, (bi + 1) * hb)
        dq_cats.append(jnp.concatenate(dqs[sl], axis=1))
        dk_cats.append(jnp.concatenate(dks[sl], axis=1))
        dv_cats.append(jnp.concatenate(dvs[sl], axis=1))
        dqkv_ref[bi, :, pl.ds(h2 * _LANES, _LANES)] = (
            dq_cats[-1].astype(dqkv_ref.dtype))
        dqkv_ref[bi, :, pl.ds((h2n + h2) * _LANES, _LANES)] = (
            dk_cats[-1].astype(dqkv_ref.dtype))
        dqkv_ref[bi, :, pl.ds((2 * h2n + h2) * _LANES, _LANES)] = (
            dv_cats[-1].astype(dqkv_ref.dtype))

    if has_bias:
        (db_ref,) = maybe_db_ref
        # Bias gradient: column-sum the fp32 cotangents in VMEM into a
        # PER-BATCH-PROGRAM partial block (index (pid_b, 0, 0) — revisited only
        # across the consecutive inner h2 steps, the same residency pattern as
        # dqkv_ref). A single grid-resident accumulator was measured 1.88 vs
        # 1.11 ms/call: the cross-program read-modify-write serializes the
        # pipeline (same trap as the tiled-bwd negative result). The (B/bb,8,3D)
        # partials are ~2.4 MB, reduced by XLA — vs the 94 MB dqkv re-read this
        # replaces. Zero-padded query rows contribute exact zeros.
        @pl.when(h2 == 0)
        def _init():
            db_ref[...] = jnp.zeros_like(db_ref)

        def colsum(cats):
            # (Sp,128) fp32 per sub-batch → (1,128); summed over sub-batches
            total = sum(jnp.sum(c, axis=0, keepdims=True) for c in cats)
            return total[0]

        db_ref[0, 0, pl.ds(h2 * _LANES, _LANES)] = (
            db_ref[0, 0, pl.ds(h2 * _LANES, _LANES)] + colsum(dq_cats))
        db_ref[0, 0, pl.ds((h2n + h2) * _LANES, _LANES)] = (
            db_ref[0, 0, pl.ds((h2n + h2) * _LANES, _LANES)] + colsum(dk_cats))
        db_ref[0, 0, pl.ds((2 * h2n + h2) * _LANES, _LANES)] = (
            db_ref[0, 0, pl.ds((2 * h2n + h2) * _LANES, _LANES)]
            + colsum(dv_cats))


def _packed_bwd_impl(qkv, g, seed, n_heads: int, causal: bool,
                     dropout_rate: float, bias=None, hid_off=0, stats=None):
    b, s, three_d = qkv.shape
    n_embd = three_d // 3
    d = n_embd // n_heads
    scale = 1.0 / math.sqrt(d)
    h2 = n_embd // _LANES
    sp = _ceil_to(s, _SUBLANE)
    x = qkv
    if sp != s:
        x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, sp - s), (0, 0)))
    # stats rows are the forward's Sp (s ≤ 512 → identical _ceil_to(s, 8));
    # the vjp plumbing only passes stats in that regime
    use_stats = stats is not None
    interpret = jax.default_backend() != "tpu"

    # bb=2 batch elements per program where VMEM allows (see kernel docstring).
    bb = 2 if (b % 2 == 0 and sp <= 384) else 1
    has_bias = bias is not None
    bias_arr = (jnp.broadcast_to(bias.astype(qkv.dtype), (_SUBLANE, three_d))
                if has_bias else jnp.zeros((_SUBLANE, three_d), qkv.dtype))
    dqkv_spec = pl.BlockSpec((bb, sp, 3 * n_embd), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    dqkv_shape = jax.ShapeDtypeStruct((b, sp, three_d), qkv.dtype)
    if has_bias:
        out_specs = (dqkv_spec,
                     pl.BlockSpec((1, _SUBLANE, 3 * n_embd),
                                  lambda b, h: (b, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (dqkv_shape,
                     jax.ShapeDtypeStruct((b // bb, _SUBLANE, three_d),
                                          jnp.float32))
    else:
        # No db output at all for the unbiased path — otherwise every backward
        # would write (and the caller discard) an uninitialized partial block.
        out_specs = dqkv_spec
        out_shape = dqkv_shape
    in_specs = [
        pl.BlockSpec((bb, sp, _LANES), lambda b, h: (b, 0, h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, sp, _LANES), lambda b, h, h2=h2: (b, 0, h2 + h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, sp, _LANES),
                     lambda b, h, h2=h2: (b, 0, 2 * h2 + h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, sp, _LANES), lambda b, h: (b, 0, h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_SUBLANE, three_d), lambda b, h: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    inputs = [x, x, x, g, bias_arr, _seed_vec(seed, hid_off)]
    if use_stats:
        in_specs.append(pl.BlockSpec((1, bb, sp, _LANES),
                                     lambda b, h: (h, b, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(stats)
    out = pl.pallas_call(
        functools.partial(_fa_packed_bwd_kernel, scale=scale, causal=causal,
                          seq_len=s, dropout_rate=dropout_rate, head_dim=d,
                          n_heads=n_heads, bb=bb, has_bias=has_bias,
                          use_stats=use_stats),
        grid=(b // bb, h2),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n_heads * sp * sp * d,
            bytes_accessed=8 * b * sp * n_embd * qkv.dtype.itemsize,
            transcendentals=b * n_heads * sp * sp,
        ),
        interpret=interpret,
    )(*inputs)
    dqkv, db = out if has_bias else (out, None)
    if sp != s:
        dqkv = dqkv[:, :s]
    return dqkv, (db[:, 0, :].sum(axis=0) if has_bias else None)


@functools.lru_cache(maxsize=None)
def _packed_fwd_cp(n_heads: int, causal: bool, dropout_rate: float,
                   has_bias: bool, emit_stats: bool = False):
    @custom_partitioning
    def fwd(qkv, bias, seed):
        return _packed_fwd_impl(qkv, seed, n_heads, causal, dropout_rate,
                                bias=bias if has_bias else None,
                                emit_stats=emit_stats)

    def infer(mesh, arg_infos, result_infos):
        (b,) = lead_spec(arg_infos[0], 1)
        sh = named(mesh, b, None, None)
        if emit_stats:  # stats (h2, B, Sp, 128): batch at dim 1
            return sh, named(mesh, None, b, None, None)
        return sh

    def part(mesh, arg_infos, result_infos):
        (b,) = lead_spec(arg_infos[0], 1)
        sh = named(mesh, b, None, None)
        arg_sh = (sh, named(mesh, None), named(mesh, None))

        def lower(qkv, bias, seed):
            hid_off = dim_offset(mesh, b, qkv.shape[0]) * n_heads
            return _packed_fwd_impl(qkv, seed, n_heads, causal, dropout_rate,
                                    bias=bias if has_bias else None,
                                    hid_off=hid_off, emit_stats=emit_stats)

        out_sh = ((sh, named(mesh, None, b, None, None)) if emit_stats
                  else sh)
        return mesh, lower, out_sh, arg_sh

    # x (3D) and y (D) are distinct factors — only the batch dim propagates.
    rule = ("b s x, c, u -> b s y, g b s w" if emit_stats
            else "b s x, c, u -> b s y")
    fwd.def_partition(partition=part, infer_sharding_from_operands=infer,
                      sharding_rule=rule)
    return fwd


@functools.lru_cache(maxsize=None)
def _packed_bwd_cp(n_heads: int, causal: bool, dropout_rate: float,
                   has_bias: bool, use_stats: bool = False):
    @custom_partitioning
    def bwd(qkv, g, bias, seed, *maybe_stats):
        dqkv, db = _packed_bwd_impl(qkv, g, seed, n_heads, causal,
                                    dropout_rate,
                                    bias=bias if has_bias else None,
                                    stats=(maybe_stats[0] if use_stats
                                           else None))
        return (dqkv, db) if has_bias else dqkv

    def infer(mesh, arg_infos, result_infos):
        (b,) = lead_spec(arg_infos[0], 1)
        sh = named(mesh, b, None, None)
        return (sh, named(mesh, None, None)) if has_bias else sh

    def part(mesh, arg_infos, result_infos):
        (b,) = lead_spec(arg_infos[0], 1)
        sh = named(mesh, b, None, None)
        arg_sh = (sh, sh, named(mesh, None), named(mesh, None))
        if use_stats:
            arg_sh = arg_sh + (named(mesh, None, b, None, None),)
        # db is a sum over the (possibly sharded) batch: each shard computes a
        # partial from its local rows, the psum over the batch mesh axes makes
        # the declared-replicated output true.
        axes = b if isinstance(b, tuple) else ((b,) if b else ())

        def lower(qkv, g, bias, seed, *maybe_stats):
            hid_off = dim_offset(mesh, b, qkv.shape[0]) * n_heads
            dqkv, db = _packed_bwd_impl(qkv, g, seed, n_heads, causal,
                                        dropout_rate,
                                        bias=bias if has_bias else None,
                                        hid_off=hid_off,
                                        stats=(maybe_stats[0] if use_stats
                                               else None))
            if not has_bias:
                return dqkv
            if axes:
                db = jax.lax.psum(db, tuple(axes))
            return dqkv, db

        out_sh = (sh, named(mesh, None, None)) if has_bias else sh
        return mesh, lower, out_sh, arg_sh

    stats_in = ", g b s w" if use_stats else ""
    rule = (f"b s x, b s y, c, u{stats_in} -> b s x, c" if has_bias
            else f"b s x, b s y, c, u{stats_in} -> b s x")
    bwd.def_partition(partition=part, infer_sharding_from_operands=infer,
                      sharding_rule=rule)
    return bwd


def _stats_enabled(s: int) -> bool:
    """(m, l)-residual gate: the fwd and full-seq bwd must agree on Sp (true
    for s ≤ 512 — both pad to _ceil_to(s, 8)), and $VIT_TPU_ATTN_STATS can
    force it off for A/B. Saving the two row stats skips the backward's
    (Sp,Sp) max/sum reductions — measured −20% on the bwd call at the
    flagship shape (VERDICT r4 next #2; BENCHMARKS.md round-5)."""
    import os

    return s <= 512 and os.environ.get("VIT_TPU_ATTN_STATS", "1") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _flash_attention_packed(qkv, seed, n_heads, causal, dropout_rate):
    bias = jnp.zeros((qkv.shape[-1],), qkv.dtype)
    return _packed_fwd_cp(n_heads, causal, dropout_rate, False)(qkv, bias, seed)


def _fa_packed_fwd(qkv, seed, n_heads, causal, dropout_rate):
    bias = jnp.zeros((qkv.shape[-1],), qkv.dtype)
    if _stats_enabled(qkv.shape[1]):
        out, stats = _packed_fwd_cp(n_heads, causal, dropout_rate, False,
                                    True)(qkv, bias, seed)
        return out, (qkv, seed, stats)
    return (_packed_fwd_cp(n_heads, causal, dropout_rate, False)(qkv, bias,
                                                                 seed),
            (qkv, seed, None))


def _fa_packed_bwd(n_heads, causal, dropout_rate, res, g):
    import numpy as np

    qkv, seed, stats = res
    bias = jnp.zeros((qkv.shape[-1],), qkv.dtype)
    if stats is not None:
        dqkv = _packed_bwd_cp(n_heads, causal, dropout_rate, False,
                              True)(qkv, g, bias, seed, stats)
    else:
        dqkv = _packed_bwd_cp(n_heads, causal, dropout_rate, False)(qkv, g,
                                                                    bias, seed)
    return dqkv, np.zeros(seed.shape, jax.dtypes.float0)


_flash_attention_packed.defvjp(_fa_packed_fwd, _fa_packed_bwd)


# --- biased variant: qkv is the UNBIASED projection, bias added in-kernel ----
#
# The payoff is in the backward: the kernel accumulates the qkv-bias gradient
# into a grid-resident VMEM block, so XLA never re-reads the (B,S,3D) dqkv just
# to column-sum it (a ~0.13 ms full-HBM pass per layer on the flagship step).

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_packed_biased(qkv, bias, seed, n_heads, causal,
                                   dropout_rate):
    return _packed_fwd_cp(n_heads, causal, dropout_rate, True)(qkv, bias, seed)


def _fa_pb_fwd(qkv, bias, seed, n_heads, causal, dropout_rate):
    if _stats_enabled(qkv.shape[1]):
        out, stats = _packed_fwd_cp(n_heads, causal, dropout_rate, True,
                                    True)(qkv, bias, seed)
        return out, (qkv, bias, seed, stats)
    out = _packed_fwd_cp(n_heads, causal, dropout_rate, True)(qkv, bias, seed)
    return out, (qkv, bias, seed, None)


def _fa_pb_bwd(n_heads, causal, dropout_rate, res, g):
    import numpy as np

    qkv, bias, seed, stats = res
    if stats is not None:
        dqkv, db = _packed_bwd_cp(n_heads, causal, dropout_rate, True,
                                  True)(qkv, g, bias, seed, stats)
    else:
        dqkv, db = _packed_bwd_cp(n_heads, causal, dropout_rate, True)(
            qkv, g, bias, seed)
    return (dqkv, db.astype(bias.dtype),
            np.zeros(seed.shape, jax.dtypes.float0))


_flash_attention_packed_biased.defvjp(_fa_pb_fwd, _fa_pb_bwd)


def flash_attention_packed(qkv: jax.Array, n_heads: int, *,
                           causal: bool = False, dropout_rate: float = 0.0,
                           dropout_rng: "jax.Array | None" = None,
                           qkv_bias: "jax.Array | None" = None) -> jax.Array:
    """Fused attention over a packed QKV projection. qkv: (B, S, 3D) → (B, S, D).

    With ``qkv_bias`` (shape (3D,)), ``qkv`` must be the UNBIASED projection
    (x·W): the bias is added inside the kernel and — the actual point — the
    backward emits the bias gradient from VMEM instead of XLA re-reading the
    full dqkv to reduce it. Gradients then flow to both qkv and qkv_bias.

    Caller must check ``packed_supported`` first; this is the zero-glue fast path
    (no head-split rearranges in XLA — see module comment above)."""
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seed = jax.random.randint(dropout_rng, (1,), 0, 2 ** 31 - 1, jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    if qkv_bias is not None:
        return _flash_attention_packed_biased(qkv, qkv_bias, seed, n_heads,
                                              causal, dropout_rate)
    return _flash_attention_packed(qkv, seed, n_heads, causal, dropout_rate)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = False, dropout_rate: float = 0.0,
                    dropout_rng: "jax.Array | None" = None) -> jax.Array:
    """Fused attention. q,k,v: (B, H, S, D) -> (B, H, S, D).

    dropout_rate > 0 applies in-kernel dropout to the attention probabilities
    (requires dropout_rng) — the mask stream hashes GLOBAL (row, col)
    coordinates, so q-block-tiled forwards and full-sequence OR q-block-tiled
    backwards regenerate identical masks regardless of their block sizes."""
    s = q.shape[-2]
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        if s > _MAX_FUSED_BWD_SEQ and not (
                _tiled_bwd_enabled()
                and _tiled_bwd_blocking(s, True) is not None):
            return attention_xla(q, k, v, causal=causal,
                                 dropout_rate=dropout_rate,
                                 dropout_rng=dropout_rng)
        seed = jax.random.randint(dropout_rng, (1,), 0, 2 ** 31 - 1, jnp.int32)
        return _flash_attention(q, k, v, seed, causal, dropout_rate)
    if s > _MAX_FUSED_SEQ:
        return attention_xla(q, k, v, causal=causal)
    seed = jnp.zeros((1,), jnp.int32)
    return _flash_attention(q, k, v, seed, causal, 0.0)
