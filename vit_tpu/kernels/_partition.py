"""custom_partitioning helpers for the Pallas kernels.

Under plain jit+GSPMD a ``pallas_call`` is an opaque custom call that XLA cannot
partition — without these rules the pjit (dp×fsdp×tp) path either replicates the
attention inputs or (round 1) had to force attn_impl="xla". Each kernel wrapper
declares which leading dims stay sharded (batch / heads); everything else is
replicated per shard and GSPMD inserts the reshards. The kernels then run on the
LOCAL shard shapes, exactly like the shard_map DP path, but composed freely with
fsdp/tp parameter sharding inside one pjit program.
"""

from __future__ import annotations

import os

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def force_xla_kernels() -> bool:
    """True when every auto-selected Pallas kernel must fall back to its XLA
    oracle path (VIT_TPU_FORCE_XLA_KERNELS=1).

    Set automatically by the entry-point mesh plumbing for MULTI-PROCESS
    meshes with a "pipe" axis (vit_tpu/train/distributed.py): GSPMD there
    emits op-shardings whose tile assignment interleaves the process-split
    pipe axis with intra-process axes, and jax's custom_partitioning machinery
    cannot re-parse them onto the mesh (parse_flatten_op_sharding →
    explode_superdims KeyError, jax 0.8). Single-process pipe meshes and all
    dp/fsdp/tp meshes keep the fused kernels."""
    return os.environ.get("VIT_TPU_FORCE_XLA_KERNELS", "") == "1"


def dim_offset(mesh, spec_entry, local_dim: int):
    """This shard's global start index along one array dim (traced scalar).

    ``spec_entry`` is the dim's PartitionSpec entry (None / axis name / tuple of
    axis names). Returns python 0 when the dim is unsharded, so unsharded lowers
    stay bit-identical to the single-device path. Must be called inside a
    custom_partitioning ``partition`` lower fn — the manual-sharding context
    where ``jax.lax.axis_index`` resolves mesh axis names."""
    if spec_entry is None:
        return 0
    axes = spec_entry if isinstance(spec_entry, tuple) else (spec_entry,)
    idx = None
    for ax in axes:
        i = jax.lax.axis_index(ax)
        idx = i if idx is None else idx * mesh.shape[ax] + i
    return idx * local_dim


def lead_spec(arg_info, n: int) -> list:
    """First ``n`` PartitionSpec entries of an operand's sharding (None-padded);
    replicated if the operand has no sharding attached."""
    sharding = getattr(arg_info, "sharding", None)
    spec = tuple(getattr(sharding, "spec", ()) or ())
    out = list(spec[:n])
    return out + [None] * (n - len(out))


def named(mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
