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
              devices: Optional[Sequence] = None, pp: int = 1) -> Mesh:
    """Build a ("data", "fsdp", "model") mesh. With dp=None, the data axis absorbs
    all devices not used by fsdp/tp/pp.

    ``pp > 1`` prepends a "pipe" axis (→ ("pipe", "data", "fsdp", "model")):
    pipeline stages live on the OUTERMOST axis so stage→stage permutes ride
    the slowest links (DCN across slices) while dp/fsdp/tp collectives stay on
    ICI — the pipeline tolerates latency (one activation handoff per tick),
    the others do not. With pp == 1 the mesh is exactly the 3-axis layout."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (fsdp * tp * pp) == 0, (n, fsdp, tp, pp)
        dp = n // (fsdp * tp * pp)
    assert dp * fsdp * tp * pp == n, f"mesh {dp}x{fsdp}x{tp}x{pp} != {n} devices"
    if pp > 1:
        arr = np.asarray(devices).reshape(pp, dp, fsdp, tp)
        return Mesh(arr, ("pipe",) + AXES)
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
