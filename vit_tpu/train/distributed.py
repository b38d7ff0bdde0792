"""Mesh plumbing for the ``train_*.py`` entry points.

The reference is strictly single-device (SURVEY.md §2c: ``device = torch.device(...)``
per script; its only multi-device trace is a dead ``gather()`` at blocks.py:457). The
TPU build's parallelism machinery (parallel/mesh.py, parallel/sharding.py) existed
since round 1 but was reachable only from tests; this module wires it into every
entry point behind one shared ``--mesh dp,fsdp,tp`` flag:

  - default (no flag): all local devices on the data axis — ``python train_titok.py``
    on a v5e-8 data-parallelizes over 8 chips with zero extra flags; on one chip the
    single-device fast path is taken (no sharding machinery in the jit at all).
  - ``--mesh 2,2,2``: dp×fsdp×tp ("data","fsdp","model") mesh; ``-1`` on one axis
    absorbs the remaining devices.
  - multi-host: set ``JAX_COORDINATOR=host:port JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i``
    (or ``JAX_COORDINATOR=auto`` on Cloud TPU for auto-detection) and launch the same
    command on every host; the mesh then spans all hosts' devices and each host's
    loader contributes a disjoint per-host batch shard
    (``jax.make_array_from_process_local_data``). ``--bs`` stays the per-process
    batch; the global batch is bs × process_count.

XLA inserts all collectives (grad psum over "data", all-gathers for "fsdp" params,
"model"-axis reductions) from the PartitionSpecs; the Pallas kernels survive the
sharded jit via their custom_partitioning rules (kernels/_partition.py).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_tpu.parallel.mesh import batch_sharding, init_distributed, make_mesh
from vit_tpu.parallel.sharding import params_shardings, state_shardings


def add_mesh_args(parser) -> None:
    """Shared CLI surface (all entry points)."""
    parser.add_argument(
        "--mesh", type=str, default=None,
        help="dp,fsdp,tp[,pp] device mesh (e.g. '2,2,2' or '2,1,1,4'; -1 "
             "absorbs remaining devices). pp>1 = GPipe pipeline parallelism "
             "over the transformer stacks (requires a model wired for "
             "pp_stages; see core/transformer.py). Default: all local devices "
             "on the data axis. Multi-host: set JAX_COORDINATOR/"
             "JAX_NUM_PROCESSES/JAX_PROCESS_ID and run the same command on "
             "every host.")
    parser.add_argument(
        "--pp_microbatches", type=int, default=0,
        help="pipeline microbatches M with a pp>1 mesh (0 = 2*pp_stages); "
             "bubble fraction = (pp-1)/(M+pp-1); --bs must divide by M")


def parse_mesh_spec(spec: Optional[str],
                    n_devices: int) -> Tuple[int, int, int, int]:
    """'dp,fsdp,tp[,pp]' → concrete axis sizes; one axis may be -1 (absorb
    the rest)."""
    if spec is None:
        return n_devices, 1, 1, 1
    parts = [int(p) for p in spec.split(",")]
    assert len(parts) in (3, 4), f"--mesh wants dp,fsdp,tp[,pp], got {spec!r}"
    if len(parts) == 3:
        parts.append(1)
    if -1 in parts:
        assert parts.count(-1) == 1, f"only one -1 axis allowed: {spec!r}"
        known = int(np.prod([p for p in parts if p != -1]))
        assert n_devices % known == 0, (spec, n_devices)
        parts[parts.index(-1)] = n_devices // known
    dp, fsdp, tp, pp = parts
    assert 0 < dp * fsdp * tp * pp <= n_devices, \
        f"--mesh {dp}x{fsdp}x{tp}x{pp} exceeds {n_devices} devices"
    return dp, fsdp, tp, pp


def pp_from_args(args) -> int:
    """Pipeline-stage count implied by --mesh (0 when no pipe axis) — the
    entry points thread this into the model config as ``pp_stages`` BEFORE
    building the MeshRunner, since the pipeline schedule lives in the model
    (core/transformer.py), not the step wrapper.

    Parsed textually: touching ``jax.device_count()`` here would initialize
    the backend before ``maybe_init_distributed()`` runs, so a multi-host
    worker would see only its local devices (and full validation happens in
    :func:`maybe_mesh_runner` anyway). Only a ``-1`` pipe axis needs the real
    device count, so only that case brings the distributed backend up."""
    spec = getattr(args, "mesh", None)
    if spec is None:
        return 0
    parts = [int(p) for p in spec.split(",")]
    if len(parts) < 4:
        return 0
    if parts[3] == -1:
        maybe_init_distributed()
        return parse_mesh_spec(spec, jax.device_count())[3]
    return parts[3]


_distributed_up = False


def maybe_init_distributed() -> None:
    """Multi-host bring-up when JAX_COORDINATOR is set (no-op otherwise;
    idempotent — callable from both pp_from_args and maybe_mesh_runner).

    JAX_COORDINATOR=auto relies on Cloud TPU metadata auto-detection."""
    global _distributed_up
    coord = os.environ.get("JAX_COORDINATOR")
    if not coord or _distributed_up:
        return
    _distributed_up = True
    if coord == "auto":
        init_distributed()
    else:
        init_distributed(coordinator_address=coord,
                         num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                         process_id=int(os.environ["JAX_PROCESS_ID"]))


def _data_group(devices_arr: np.ndarray, axis_names: Sequence[str],
                pid: int, pcount: int) -> Tuple[int, int]:
    """This process's (data_group_index, num_data_groups) on a concrete mesh
    device array.

    A "data group" is the set of processes whose devices cover the same
    data-axis coordinates: batch rows are sharded over "data" and REPLICATED
    over every other mesh axis (mesh.batch_sharding = P("data")), so processes
    in the same group must feed IDENTICAL input streams while different groups
    must feed DISJOINT ones. Examples (2 processes × 4 devices):

      --mesh 2,2,2    → procs cover data coords {0},{1}  → groups (0,2),(1,2)
      --mesh 4,1,1,2  → both procs cover the FULL data axis (the pipe axis
                        crosses the process boundary) → both get (0,1):
                        identical streams, as pipeline replication requires.
    """
    didx = list(axis_names).index("data")
    dp = devices_arr.shape[didx]
    procs = np.vectorize(lambda d: d.process_index)(devices_arr)
    if (procs == pid).sum() == 0:
        # this process holds no mesh devices — mirror MeshRunner's
        # full-axis fallback (it would feed the whole batch)
        return 0, 1

    def aligned(p):
        """(group, ngroups) for process p, or None if its data-axis coverage
        is non-contiguous/unaligned (exotic device order)."""
        coords = np.unique(np.argwhere(procs == p)[:, didx])
        ddp = int(coords.size)
        lo = int(coords.min())
        if dp % ddp or lo % ddp or (coords != np.arange(lo, lo + ddp)).any():
            return None
        return lo // ddp, dp // ddp

    # The group scheme must be chosen CONSISTENTLY across processes — deciding
    # the fallback per-process would mix a data-group partition with a
    # (pid, pcount) partition on the same stream (overlapping slices, unread
    # data). Every process sees the full device array, so each evaluates ALL
    # processes and they agree: the aligned scheme applies only if every
    # device-owning process is aligned AND agrees on the group count.
    groups = {int(p): aligned(int(p)) for p in np.unique(procs)}
    if (any(g is None for g in groups.values())
            or len({g[1] for g in groups.values()}) != 1):
        # per-process split is at least disjoint; put_batch trims/replicates
        return pid, pcount
    return groups[pid]


def host_shard(args=None) -> Tuple[int, int]:
    """(shard_id, num_shards) for slicing the input stream per host — this
    process's DATA-GROUP coordinates on the mesh implied by ``args.mesh``.

    Multihost DP is only correct if each data group feeds DISTINCT data: the
    batch assembled by ``jax.make_array_from_process_local_data`` concatenates
    the groups' local arrays along the batch axis, so groups reading identical
    streams would train on N copies of every sample (gradients average to the
    single-host gradient — N× the compute for 1× the data). Conversely,
    processes covering the SAME data coordinates (only pipe/fsdp/model axes
    cross the process boundary, e.g. ``--mesh 4,1,1,2`` over 2 hosts) must
    feed IDENTICAL rows — so they get the same (shard_id, num_shards) here,
    and the deterministic loaders produce the same stream. Entry points pass
    this into their loader builders: file-backed loaders slice the shard/file
    list by (shard_id, num_shards); synthetic loaders offset the seed.

    Pass the parsed ``args`` (for ``args.mesh``); with no args or no --mesh
    the default mesh puts every device on the data axis, where the data-group
    split IS (process_index, process_count).

    Brings the multi-host backend up first (idempotent) so the process index
    is meaningful regardless of where loader construction sits in main().
    """
    maybe_init_distributed()
    pid, pcount = jax.process_index(), jax.process_count()
    if pcount == 1:
        return 0, 1
    spec = getattr(args, "mesh", None) if args is not None else None
    if spec is None:
        return pid, pcount
    dp, fsdp, tp, pp = parse_mesh_spec(spec, jax.device_count())
    devices = np.asarray(
        jax.devices()[:dp * fsdp * tp * pp]).reshape(pp, dp, fsdp, tp)
    return _data_group(devices, ("pipe", "data", "fsdp", "model"), pid, pcount)


class MeshRunner:
    """Sharding helpers for an entry-point loop over one ("data","fsdp","model") mesh.

    Specs passed to :meth:`jit_step` are either the string kinds "batch" /"rep" or an
    explicit (prefix-)pytree of shardings, e.g. the tree returned by
    :meth:`shard_state` for TrainState arguments.
    """

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.batch = batch_sharding(mesh)
        self.rep = NamedSharding(mesh, P())
        # data-axis coordinates covered by THIS process's devices. Equal to
        # data_size/process_count when the data axis splits across processes
        # (the common dp-multi-host case), but a process covers the FULL data
        # axis when only other mesh axes (e.g. the outermost "pipe") span the
        # process boundary — its devices then address every batch row.
        didx = mesh.axis_names.index("data")
        coords = np.argwhere(np.vectorize(
            lambda d: d.process_index == jax.process_index())(mesh.devices))
        self._data_coords_covered = int(np.unique(coords[:, didx]).size) \
            if coords.size else mesh.shape["data"]

    def host_shard(self) -> Tuple[int, int]:
        """This process's (data_group_index, num_data_groups) on the LIVE mesh
        — must agree with module-level :func:`host_shard` parsed from the same
        --mesh spec (pinned by tests/test_multihost.py)."""
        return _data_group(self.mesh.devices, self.mesh.axis_names,
                           jax.process_index(), jax.process_count())

    # -- placement -------------------------------------------------------------
    def shard_state(self, state) -> Tuple[Any, Any]:
        """(sharded_state, sharding_tree) for a TrainState."""
        sh = state_shardings(self.mesh, state)
        return jax.device_put(state, sh), sh

    def shard_params(self, params) -> Tuple[Any, Any]:
        """(sharded_params, sharding_tree) for a bare param tree (frozen models)."""
        sh = params_shardings(self.mesh, params)
        return jax.device_put(params, sh), sh

    def put_rep(self, x):
        return jax.device_put(x, self.rep)

    def put_batch(self, array):
        """Host batch → global batch-sharded device array. Multi-host: this process's
        array covers exactly the data-axis coordinates its devices address —
        its disjoint shard of the bs×(data groups) global batch when the data
        axis splits across processes, or the FULL global batch when only other
        mesh axes (e.g. "pipe") cross the process boundary. In the latter case
        batch rows are replicated across those axes, so every process in the
        same data position must feed identical rows — the loaders are
        deterministic per stream position, which guarantees this.

        A trailing partial batch (e.g. an eval loader with drop_last=False) that does
        not divide the data axis is trimmed to the largest shardable multiple, with a
        one-time warning — train loaders all use drop_last semantics, so this only
        ever drops tail eval examples."""
        array = np.asarray(array)
        ddp = self._data_coords_covered
        if array.shape[0] % max(ddp, 1) != 0:
            keep = (array.shape[0] // ddp) * ddp
            if keep == 0:
                raise ValueError(
                    f"batch size {array.shape[0]} < data-axis size {ddp}: "
                    f"raise --bs or shrink the mesh (--mesh dp,fsdp,tp)")
            if not getattr(self, "_trim_warned", False):
                self._trim_warned = True
                print(f"WARN: batch {array.shape[0]} not divisible by data axis; "
                      f"trimming to {keep} (further trims silent)")
            array = array[:keep]
        if jax.process_count() > 1:
            groups = self.mesh.shape["data"] // ddp  # disjoint data groups
            global_shape = (array.shape[0] * groups,) + array.shape[1:]
            return jax.make_array_from_process_local_data(
                self.batch, array, global_shape)
        return jax.device_put(array, self.batch)

    # -- compilation -----------------------------------------------------------
    def _resolve(self, spec):
        """"batch"/"rep" strings → NamedShardings; lists/tuples recurse; sharding
        pytrees (e.g. a TrainState sharding tree) pass through."""
        if isinstance(spec, str):
            return {"batch": self.batch, "rep": self.rep}[spec]
        if isinstance(spec, (list, tuple)):
            return tuple(self._resolve(s) for s in spec)
        return spec

    def jit_step(self, fn, *, in_specs: Sequence, out_specs: Any,
                 donate_argnums: Union[Tuple[int, ...], Tuple] = ()):
        return jax.jit(
            fn,
            in_shardings=self._resolve(in_specs),
            out_shardings=self._resolve(out_specs),
            donate_argnums=donate_argnums)


def maybe_mesh_runner(args) -> Optional[MeshRunner]:
    """Build the entry point's MeshRunner, or None for the single-device fast path
    (exactly the round-2 jit, no sharding machinery). Called once per script."""
    maybe_init_distributed()
    n = jax.device_count()
    spec = getattr(args, "mesh", None)
    if spec is None and n == 1:
        return None
    dp, fsdp, tp, pp = parse_mesh_spec(spec, n)
    if dp * fsdp * tp * pp == 1:
        return None
    # an explicit --mesh smaller than the host takes the first devices
    devices = jax.devices()[:dp * fsdp * tp * pp]
    if pp > 1 and jax.process_count() > 1:
        # jax's custom_partitioning cannot re-parse GSPMD op-shardings on a
        # process-split pipe mesh (kernels/_partition.py:force_xla_kernels) —
        # auto-selected Pallas kernels fall back to their XLA oracle paths.
        os.environ.setdefault("VIT_TPU_FORCE_XLA_KERNELS", "1")
        if jax.process_index() == 0:
            print("MESH: multi-process pipe axis — auto Pallas kernels fall "
                  "back to XLA paths (VIT_TPU_FORCE_XLA_KERNELS=1)")
    runner = MeshRunner(make_mesh(dp=dp, fsdp=fsdp, tp=tp, pp=pp,
                                  devices=devices))
    if jax.process_index() == 0:
        print(f"MESH: dp={dp} fsdp={fsdp} tp={tp} pp={pp} over {n} devices "
              f"({jax.process_count()} process(es))")
    return runner


def is_addressable(x) -> bool:
    """True when ``jax.device_get(x)``/slicing is safe on this process (single-host
    arrays, or multi-host fully-replicated scalars/metrics)."""
    return getattr(x, "is_fully_addressable", True) or \
        getattr(x, "is_fully_replicated", False)
