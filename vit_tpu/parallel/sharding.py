"""Parameter sharding rules: param-tree path → PartitionSpec.

Rules are path+shape based so no model code changes are needed (the models stay plain
Flax modules; GSPMD propagates activation shardings from these parameter specs and the
batch spec). Covers every parameter family in this repo:

  - fused QKV / MLP up-projection kernels  → column-parallel: P("fsdp", "model")
  - attention out-proj / MLP down-projection → row-parallel:  P("model", "fsdp")
  - their biases                            → sharded over "model" (column side) /
                                              replicated (row side, psum'd output)
  - token/positional/codebook embeddings    → replicated rows, "fsdp" on features
  - LayerNorm scales/biases, small vectors  → replicated

This is the Megatron column/row-parallel pattern expressed as PartitionSpecs; XLA
inserts the all-reduce after row-parallel matmuls.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_COLUMN_KERNELS = ("qkv", "fc1", "to_qkv", "ff1")
_ROW_KERNELS = ("out_proj", "fc2", "to_out", "ff2")


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path).lower()


def _base_spec(path: str, ndim: int) -> tuple:
    is_kernel = path.endswith("kernel")
    parent = path.rsplit("/", 2)[-2] if "/" in path else ""
    # the enhancing transformer's flat layout suffixes per-layer module names
    # (ff1_0, attn_11, ...) — strip so both layouts hit one rule table
    parent = re.sub(r"_\d+$", "", parent)
    if is_kernel and ndim == 2:
        if parent in _COLUMN_KERNELS:
            return ("fsdp", "model")
        if parent in _ROW_KERNELS:
            return ("model", "fsdp")
        return ("fsdp", None)           # generic projections: shard the big dim
    if path.endswith("bias") and ndim == 1:
        if parent in _COLUMN_KERNELS:
            return ("model",)
        return ()
    if ndim == 2:                        # embeddings / codebooks (rows = vocab/pos)
        if "codebook" in path:
            return ()                    # small; argmax over full codebook
        return (None, "fsdp")
    return ()


def spec_for(path: str, leaf) -> P:
    ndim = leaf.ndim
    # Stacked-layer layouts (core/transformer.py): under a "layers" segment,
    # block params gain leading stack axes over their base shape (kernels are
    # 2-D underneath, everything else 1-D):
    #   1 lead axis  — scan_layers (n_layers, ...): replicate it (lax.scan
    #     slices it per step; sharding it would gather per iteration);
    #   2 lead axes  — pp_stages (stages, layers_per_stage, ...): the stage
    #     axis shards over "pipe" (each device holds its own stage's layers),
    #     the within-stage layer axis replicates.
    # The base dims shard exactly as the unrolled layout would.
    if "layers" in path.split("/") and ndim >= 1:
        base_ndim = 2 if path.endswith(("kernel", "kernel_q")) else 1
        n_lead = ndim - base_ndim
        lead = {1: (None,), 2: ("pipe", None)}.get(n_lead)
        if lead is None:
            return P()
        base = _base_spec(path, base_ndim)
        return P(*lead, *(base + (None,) * (base_ndim - len(base))))
    return P(*_base_spec(path, ndim))


def _mesh_spec(mesh: Mesh, spec: P) -> P:
    """Drop axis names the mesh does not have (e.g. "pipe" on a 3-axis
    dp×fsdp×tp mesh: pipeline-layout params then replicate the stage axis)."""
    names = set(mesh.axis_names)
    return P(*[a if a in names else None for a in spec])


def params_shardings(mesh: Mesh, params) -> Any:
    """PartitionSpec tree (as NamedShardings) for a param pytree."""

    def assign(path, leaf):
        return NamedSharding(mesh, _mesh_spec(mesh, spec_for(_path_str(path),
                                                             leaf)))

    return jax.tree_util.tree_map_with_path(assign, params)


def state_shardings(mesh: Mesh, state) -> Any:
    """Shardings for a full TrainState (params + optimizer moments follow the same
    specs; scalars/step counters replicated)."""

    def assign(path, leaf):
        p = _path_str(path)
        if getattr(leaf, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _mesh_spec(mesh, spec_for(p, leaf)))

    return jax.tree_util.tree_map_with_path(assign, state)
