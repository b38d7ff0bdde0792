"""Fused linear-layer backward: dW = xᵀ·g and db = Σₙ g in ONE pass over g.

Motivation (BENCHMARKS.md "remaining candidates"): on the flagship TiTok-B
step XLA computes each fc bias gradient as a standalone column-sum that
re-reads the full upstream gradient from HBM (fc1: a (B·S, 4C) slab per
layer) — ~14 ms/step across the 24 transformer blocks' fc1+fc2 sites. The
attention kernel already closed the same pool for the qkv bias by emitting
the bias gradient from VMEM (kernels/attention.py); this kernel does it for
the MLP matmuls: a block-tiled dW matmul whose inner loop already streams g
through VMEM, so the column-sum accumulates alongside for free.

Design constraints learned from this repo's measured negatives:
  - do NOT touch the forward: ``fused_dense`` keeps y = x·W + b as plain XLA
    ops (custom_vjp is inlined into the jaxpr, so epilogue fusions like
    bias+GELU survive) — unlike the round-2 bias+GELU op (260→227 img/s) and
    the fused-LN custom_vjp (AD-residual traffic), which both lost by
    splitting or re-materializing forward state. The residuals saved here
    (x, W) are exactly what XLA's own AD saves.
  - dx = g·Wᵀ stays in XLA (a plain matmul it already schedules well).
  - accumulation happens in a grid-resident fp32 VMEM output block with the
    reduction dim innermost (the standard Mosaic matmul schedule), NOT via
    cross-program read-modify-write (measured to serialize the grid).

Layouts: a (N, Ca), b (N, K), contraction over N (= B·S tokens, dim 0 of
both). ``dot_general`` with a dim0×dim0 contraction lowers to an MXU matmul
with the lhs transpose folded in. ``db_operand`` selects which operand's
column-sum to emit: fc1 wants colsum(g)=colsum(b); fc2 is computed
TRANSPOSED (dWᵀ = gᵀ·h, so the big operand needs no transpose) and wants
colsum(g)=colsum(a).

Used by core/transformer.py's Mlp when ``TransformerConfig.fused_fc_grad``
(env ``VIT_TPU_FUSED_FC``) is enabled. Reference context: the torch MLP at
transformer.py:35-40 gets all of this from cuBLAS+autograd; this is the TPU
equivalent with the bias-grad HBM pass deleted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANE = 8
_BN = 512                      # token rows per grid step
_ACC_VMEM_BUDGET = 4 * 1024 * 1024   # fp32 bytes for the resident dW block


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supported(ca: int, k: int) -> bool:
    """Both matmul dims must be lane-aligned and the resident fp32 dW block
    must leave VMEM room for the pipelined input buffers."""
    return (ca % _LANES == 0 and k % _LANES == 0
            and ca * 4 * _LANES <= _ACC_VMEM_BUDGET)


def _transpose_mode() -> str:
    """How the lhs reaches the MXU. "dimnums": dot_general with a dim0×dim0
    contraction (Mosaic folds the transpose into the matmul when it can);
    "explicit": jnp.dot(a.T, b) — a VPU relayout per block, the fallback if
    Mosaic rejects the non-standard bf16 contraction (round-2 rule: bf16
    wants (M,K)×(K,N)). Env VIT_TPU_FC_GRAD_T switches for on-chip A/B."""
    import os

    return os.environ.get("VIT_TPU_FC_GRAD_T", "dimnums")


def _fc_grad_kernel(a_ref, b_ref, dw_ref, db_ref, *, n_total: int, bn: int,
                    db_operand: int, tmode: str):
    j = pl.program_id(0)
    r = pl.program_id(1)
    a = a_ref[:]
    b = b_ref[:]
    if n_total % bn:
        # ragged final row-block: zero the out-of-bounds token rows of BOTH
        # operands — their contents are undefined (NaN in interpret mode),
        # and 0·NaN = NaN, so masking just one side is not enough
        rows = jax.lax.broadcasted_iota(jnp.int32, (bn, 1), 0) + r * bn
        valid = rows < n_total
        a = jnp.where(valid, a, 0).astype(a.dtype)
        b = jnp.where(valid, b, 0).astype(b.dtype)
    if tmode == "explicit":
        part = jnp.dot(a.T, b, preferred_element_type=jnp.float32)
    else:
        part = jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @pl.when(r == 0)
    def _init():
        dw_ref[:] = part

    @pl.when(r != 0)
    def _acc():
        dw_ref[:] = dw_ref[:] + part

    # bias grad: per-sublane partial column sums (a free (8, W) reshape-sum
    # while the operand sits in VMEM); the final 8-row fold happens in XLA
    src = a if db_operand == 0 else b
    w = src.shape[1]
    p8 = jnp.sum(src.astype(jnp.float32).reshape(bn // _SUBLANE, _SUBLANE, w),
                 axis=0)
    if db_operand == 0:
        # db block is constant across j: accumulate on the first column pass
        @pl.when(jnp.logical_and(j == 0, r == 0))
        def _db_init():
            db_ref[:] = p8

        @pl.when(jnp.logical_and(j == 0, r != 0))
        def _db_acc():
            db_ref[:] = db_ref[:] + p8
    else:
        @pl.when(r == 0)
        def _db_init():
            db_ref[:] = p8

        @pl.when(r != 0)
        def _db_acc():
            db_ref[:] = db_ref[:] + p8


def matmul_dw_db(a: jax.Array, b: jax.Array, *, db_operand: int = 1):
    """a (N, Ca), b (N, K) → (dW (Ca, K) fp32, db fp32 over the chosen
    operand's columns). dW = aᵀ·b; db = Σₙ a or Σₙ b per ``db_operand``."""
    n, ca = a.shape
    k = b.shape[1]
    assert b.shape[0] == n, (a.shape, b.shape)
    assert supported(ca, k), (ca, k)

    bn = min(_BN, _ceil_to(n, _SUBLANE))
    # largest 128-multiple block ≤ the VMEM budget that DIVIDES k (k is a
    # lane multiple, so bk=128 always closes the search) — a non-divisor
    # would force a padded full copy of g and waste MXU work on the pad
    budget = max(_LANES, (_ACC_VMEM_BUDGET // (ca * 4)) // _LANES * _LANES)
    bk = next(c for c in range(min(k, budget), 0, -_LANES) if k % c == 0)
    dbw = ca if db_operand == 0 else bk
    db_idx = ((lambda j, r: (0, 0)) if db_operand == 0
              else (lambda j, r: (0, j)))
    interpret = jax.default_backend() != "tpu"
    dw, db8 = pl.pallas_call(
        functools.partial(_fc_grad_kernel, n_total=n, bn=bn,
                          db_operand=db_operand, tmode=_transpose_mode()),
        grid=(k // bk, pl.cdiv(n, bn)),
        in_specs=[
            pl.BlockSpec((bn, ca), lambda j, r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda j, r: (r, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ca, bk), lambda j, r: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, dbw), db_idx, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ca, k), jnp.float32),
            jax.ShapeDtypeStruct((_SUBLANE, ca if db_operand == 0 else k),
                                 jnp.float32),
        ],
        interpret=interpret,
    )(a, b)
    return dw, jnp.sum(db8, axis=0)


# --- GSPMD partitioning -------------------------------------------------------
#
# Token dims (batch, seq) may be sharded under dp/fsdp; dW/db are then the SUM
# of the per-shard partials — the lower computes the local kernel and psums
# over the token-sharding axes, mirroring what GSPMD inserts for XLA's own dW
# dots. Feature dims: Ca replicated; K may be tp-sharded (column-parallel fc1)
# and stays sharded in dW/db.

from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402

from vit_tpu.kernels._partition import lead_spec, named  # noqa: E402


def _axes(*entries):
    out = []
    for e in entries:
        if e is None:
            continue
        out.extend(e if isinstance(e, tuple) else (e,))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _fc_grad_cp(db_operand: int):
    @custom_partitioning
    def op(x, g):
        # x (B, S, Ca), g (B, S, K): flatten tokens and run the kernel
        a = x.reshape(-1, x.shape[-1])
        b = g.reshape(-1, g.shape[-1])
        return matmul_dw_db(a, b, db_operand=db_operand)

    def infer(mesh, arg_infos, result_infos):
        _, _, ca = lead_spec(arg_infos[0], 3)
        _, _, k = lead_spec(arg_infos[1], 3)
        dbs = ca if db_operand == 0 else k
        return (named(mesh, ca, k), named(mesh, dbs))

    def part(mesh, arg_infos, result_infos):
        bx, sx, ca = lead_spec(arg_infos[0], 3)
        _, _, k = lead_spec(arg_infos[1], 3)
        # token shards must agree between x and g (same activation layout)
        arg_sh = (named(mesh, bx, sx, ca), named(mesh, bx, sx, k))
        dbs = ca if db_operand == 0 else k
        out_sh = (named(mesh, ca, k), named(mesh, dbs))
        token_axes = _axes(bx, sx)

        def lower(x, g):
            a = x.reshape(-1, x.shape[-1])
            b = g.reshape(-1, g.shape[-1])
            dw, db = matmul_dw_db(a, b, db_operand=db_operand)
            if token_axes:
                dw = jax.lax.psum(dw, token_axes)
                db = jax.lax.psum(db, token_axes)
            return dw, db

        return mesh, lower, out_sh, arg_sh

    op.def_partition(partition=part, infer_sharding_from_operands=infer,
                     sharding_rule="b s c, b s k -> c k, k" if db_operand
                     else "b s c, b s k -> c k, c")
    return op


# --- the user-facing op -------------------------------------------------------


@jax.custom_vjp
def fused_dense(x: jax.Array, kernel: jax.Array, bias: jax.Array):
    """y = x·W + b with a fused dW+db backward.

    x (B, S, Cin), kernel (Cin, Cout), bias (Cout,) — all compute-dtype (the
    caller casts params, exactly like flax Dense). Forward is plain XLA (so
    neighbouring fusions — e.g. a GELU epilogue — are untouched); backward
    computes dx in XLA and (dW, db) in one Pallas pass over the upstream
    gradient instead of XLA's separate matmul + column-sum reduction.
    """
    return jnp.dot(x, kernel) + bias


def _fd_fwd(x, kernel, bias):
    return jnp.dot(x, kernel) + bias, (x, kernel)


def _fd_bwd(res, g):
    x, kernel = res
    dx = jnp.dot(g, kernel.T)
    cin, cout = kernel.shape
    if cin <= cout:
        # fc1-like (fan-out): dW = xᵀ·g directly; db = colsum(g) = colsum(b)
        dw, db = _fc_grad_cp(1)(x, g)
    else:
        # fc2-like (fan-in): compute dWᵀ = gᵀ·x so the resident fp32 block is
        # (Cout, bk) — small side on sublanes — then let XLA transpose once
        dwt, db = _fc_grad_cp(0)(g, x)
        dw = dwt.T
    return dx, dw.astype(kernel.dtype), db.astype(g.dtype)


fused_dense.defvjp(_fd_fwd, _fd_bwd)


def fused_dense_supported(cin: int, cout: int) -> bool:
    lo, hi = min(cin, cout), max(cin, cout)
    return supported(lo, hi)
