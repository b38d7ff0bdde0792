"""Fused codebook nearest-neighbor lookup (Pallas).

TPU-native replacement for the reference's ``torch.cdist(x, embedding).argmin(-1)``
(train_titok.py:53 and its three copies; blocks.py:440-445 expanded-square form).

Key observation: both sides are L2-normalized, so argmin of Euclidean distance equals
argmax of the dot product (‖a−b‖² = 2 − 2a·b). The kernel fuses normalization, the
z·Eᵀ matmul and the argmax so the (N, C) score matrix never leaves VMEM — at reference
scale (N = 8192 latents, C = 16384 codes) XLA would otherwise round-trip a 512 MB fp32
distance matrix through HBM.

Layout: the codebook is passed transposed (D, C) so the tiny latent dim (e.g. 12)
lands on the sublane axis and the large codebook dim on lanes — (12, 16384) packs into
~1 MB of VMEM instead of 8 MB lane-padded.

fp32 throughout (the reference forces fp32 for quantization under AMP, blocks.py:428).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_CODEBOOK_FUSED = 32768
_VMEM_SCORE_BUDGET = 8 * 1024 * 1024  # fp32 bytes for the per-block score matrix


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _vq_kernel(z_ref, et_ref, idx_ref, *, l2_normalize: bool, n_codes: int):
    """z (BN, D) fp32, eᵀ (D, C) fp32 -> indices (BN, 1) int32."""
    z = z_ref[:]
    et = et_ref[:]
    if l2_normalize:
        z = z * jax.lax.rsqrt(jnp.sum(z * z, axis=-1, keepdims=True) + 1e-24)
        et = et * jax.lax.rsqrt(jnp.sum(et * et, axis=0, keepdims=True) + 1e-24)
        scores = jnp.dot(z, et, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    else:
        # un-normalized: minimize ‖z‖² − 2z·e + ‖e‖² ⇔ maximize z·e − ‖e‖²/2
        scores = jnp.dot(z, et, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        scores = scores - 0.5 * jnp.sum(et * et, axis=0, keepdims=True)
    bn, c = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, c), dimension=1)
    scores = jnp.where(col < n_codes, scores, jnp.finfo(jnp.float32).min)
    idx_ref[:] = jnp.argmax(scores, axis=-1, keepdims=True).astype(jnp.int32)


def nearest_code_xla(z: jax.Array, codebook: jax.Array, *,
                     l2_normalize: bool = True) -> jax.Array:
    """XLA oracle: argmin over full pairwise squared distances. z (N,D), e (C,D)."""
    z = z.astype(jnp.float32)
    e = codebook.astype(jnp.float32)
    if l2_normalize:
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
    d = (jnp.sum(z * z, -1, keepdims=True) + jnp.sum(e * e, -1)[None]
         - 2.0 * jnp.matmul(z, e.T, precision=jax.lax.Precision.HIGHEST))
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def _vq_impl(zf32: jax.Array, et: jax.Array, *, l2_normalize: bool,
             n_codes: int) -> jax.Array:
    """zf32 (N, D) fp32, eᵀ (D, Cp) fp32 (lane-padded) → (N,) int32.
    Pads/derives the grid from ITS OWN input shape so it works on local shards
    inside the custom_partitioning lowering below."""
    n, d = zf32.shape
    cp = et.shape[1]
    block_n = max(8, min(512, _VMEM_SCORE_BUDGET // (cp * 4)))
    block_n = _ceil_to(block_n, 8)
    np_ = _ceil_to(n, block_n)
    if np_ != n:
        zf32 = jnp.pad(zf32, ((0, np_ - n), (0, 0)))

    interpret = jax.default_backend() != "tpu"
    idx = pl.pallas_call(
        functools.partial(_vq_kernel, l2_normalize=l2_normalize, n_codes=n_codes),
        grid=(np_ // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * cp * d,
            bytes_accessed=(np_ * d + d * cp + np_) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(zf32, et)
    return idx[:n, 0]


@functools.lru_cache(maxsize=None)
def _vq_cp(l2_normalize: bool, n_codes: int):
    """GSPMD rule: rows (tokens) shardable, codebook replicated — pjit keeps the
    fused kernel on local shards (see kernels/_partition.py)."""
    from jax.experimental.custom_partitioning import custom_partitioning

    from vit_tpu.kernels._partition import lead_spec, named

    @custom_partitioning
    def run(zf32, et):
        return _vq_impl(zf32, et, l2_normalize=l2_normalize, n_codes=n_codes)

    def infer(mesh, arg_infos, result_infos):
        (n,) = lead_spec(arg_infos[0], 1)
        return named(mesh, n)

    def part(mesh, arg_infos, result_infos):
        (n,) = lead_spec(arg_infos[0], 1)
        arg_sh = (named(mesh, n, None), named(mesh, None, None))

        def lower(zf32, et):
            return _vq_impl(zf32, et, l2_normalize=l2_normalize,
                            n_codes=n_codes)

        return mesh, lower, named(mesh, n), arg_sh

    run.def_partition(partition=part, infer_sharding_from_operands=infer,
                      sharding_rule="n d, d c -> n")
    return run


def nearest_code(z: jax.Array, codebook: jax.Array, *,
                 l2_normalize: bool = True, impl: str | None = None) -> jax.Array:
    """Nearest codebook index per row. z: (..., D), codebook: (C, D) -> (...,) int32.

    Forward-only (indices carry no gradient); the straight-through estimator lives in
    the quantizer module (vit_tpu/quantize/vq.py).
    """
    if impl is None:
        # scoped override: data-parallel serving exports force "xla" here —
        # the custom_partitioning wrapper below registers compile-time Python
        # callbacks that jax.export cannot serialize under a sharded jit
        # (serve/export.py:export_fn)
        import os

        from vit_tpu.kernels._partition import force_xla_kernels

        impl = os.environ.get("VIT_TPU_VQ_IMPL") or None
        if impl is None and force_xla_kernels():
            impl = "xla"
    batch_shape = z.shape[:-1]
    d = z.shape[-1]
    c = codebook.shape[0]
    zf = z.reshape(-1, d)

    # symbolic token counts (jax.export shape polymorphism, serve/export.py
    # --bs 0) cannot size a pallas grid — auto falls back to the XLA oracle
    static_n = isinstance(zf.shape[0], int)
    use_pallas = impl == "pallas" or (
        impl is None and c <= _MAX_CODEBOOK_FUSED and static_n)
    if impl == "xla" or not use_pallas:
        return nearest_code_xla(zf, codebook, l2_normalize=l2_normalize
                                ).reshape(batch_shape)

    cp = _ceil_to(c, 128)
    # Indices are intrinsically non-differentiable; stop gradients at the kernel
    # boundary so autodiff never tries to linearize through pallas_call.
    zf32 = jax.lax.stop_gradient(zf.astype(jnp.float32))
    et = jax.lax.stop_gradient(
        jnp.pad(codebook.astype(jnp.float32).T, ((0, 0), (0, cp - c))))
    idx = _vq_cp(l2_normalize, c)(zf32, et)
    return jax.lax.stop_gradient(idx.reshape(batch_shape))
