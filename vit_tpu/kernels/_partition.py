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

from jax.sharding import NamedSharding, PartitionSpec as P


def lead_spec(arg_info, n: int) -> list:
    """First ``n`` PartitionSpec entries of an operand's sharding (None-padded);
    replicated if the operand has no sharding attached."""
    sharding = getattr(arg_info, "sharding", None)
    spec = tuple(getattr(sharding, "spec", ()) or ())
    out = list(spec[:n])
    return out + [None] * (n - len(out))


def named(mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
