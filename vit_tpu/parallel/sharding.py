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
    # scan_layers stacks (core/transformer.py): every block param gains a
    # leading n_layers axis under a "layers" segment — shard the underlying
    # dims exactly as the unrolled layout would, replicate the layer axis
    # (lax.scan slices it per step; sharding it would gather per iteration).
    if "layers" in path.split("/") and ndim >= 1:
        base = _base_spec(path, ndim - 1)
        return P(None, *(base + (None,) * (ndim - 1 - len(base))))
    return P(*_base_spec(path, ndim))


def params_shardings(mesh: Mesh, params) -> Any:
    """PartitionSpec tree (as NamedShardings) for a param pytree."""

    def assign(path, leaf):
        return NamedSharding(mesh, spec_for(_path_str(path), leaf))

    return jax.tree_util.tree_map_with_path(assign, params)


def state_shardings(mesh: Mesh, state) -> Any:
    """Shardings for a full TrainState (params + optimizer moments follow the same
    specs; scalars/step counters replicated)."""

    def assign(path, leaf):
        p = _path_str(path)
        if getattr(leaf, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec_for(p, leaf))

    return jax.tree_util.tree_map_with_path(assign, state)
