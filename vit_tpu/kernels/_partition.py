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

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


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
