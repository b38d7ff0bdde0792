"""Device mesh construction: ("data", "fsdp", "model") axes.

The reference has no distributed backend at all (SURVEY.md §2c — its only multi-device
trace is a dead, undefined ``gather()`` call at blocks.py:457). The TPU build's
parallelism story is one mesh + PartitionSpecs:

  - "data":  batch data-parallelism (grad psum over ICI — subsumes the reference's
             intended all-gather for codebook stats);
  - "fsdp":  parameter/optimizer sharding (ZeRO-style) for L-size models;
  - "model": tensor parallelism over heads / MLP hidden dim.

XLA inserts the collectives; within a slice they ride ICI. Multi-host extension is
``jax.distributed.initialize`` + the same mesh over all processes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


AXES = ("data", "fsdp", "model")


def make_mesh(dp: Optional[int] = None, fsdp: int = 1, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("data", "fsdp", "model") mesh. With dp=None, the data axis absorbs
    all devices not used by fsdp/tp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (fsdp * tp) == 0, (n, fsdp, tp)
        dp = n // (fsdp * tp)
    assert dp * fsdp * tp == n, f"mesh {dp}x{fsdp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, AXES)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: jax.distributed.initialize (auto-detected on Cloud TPU
    when called with no args). After this, ``make_mesh`` spans all hosts' devices and
    the same pjit code runs ICI-within-slice / DCN-across-slices. Single-process runs
    may skip this entirely."""
    import jax.distributed

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: sharded over the data axis, replicated elsewhere."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
