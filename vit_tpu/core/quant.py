"""Int8 serving quantization: weight-only int8 storage + dynamic per-row
activation quantization, executed as native int8×int8→int32 MXU matmuls.

The reference has no quantization story (its checkpoints and inference run the
training dtypes). On TPU v5e the MXU's int8 path has 2× the bf16 peak
(394 vs 197 TOPS) and int8 weights stream from HBM at 4× fewer bytes than
fp32 / 2× fewer than bf16 — for small-batch serving, where the weight stream
dominates, that is the whole latency budget. This module supplies:

  * ``quantize_kernel(w)``  — per-output-channel symmetric int8 quantization
    of a Dense kernel: ``w ≈ kernel_q * scale[None, :]``.
  * ``int8_matmul(x, kernel_q, scale)`` — dynamic symmetric per-row
    quantization of the activation (absmax over the contraction axis) followed
    by a ``lax.dot_general`` with int8 operands and
    ``preferred_element_type=int32`` (the MXU-native form), then the exact
    fp32 rescale ``y_i32 * s_x * scale``.
  * ``QuantDense`` / ``QuantProjParams`` — Flax modules holding the quantized
    param tree ({kernel_q: int8, scale: f32, bias: f32}); drop-in for the
    transformer's Dense sites when ``TransformerConfig.quant == "int8"``.
  * ``quantize_params(target_tree, params_fp)`` — converts a trained fp param
    pytree into the quantized model's tree (kernel → kernel_q + scale at each
    quantized site, verbatim copy everywhere else).

This is a SERVING-ONLY path: round() has zero gradient, so a quantized model
is not trainable (no straight-through estimator on purpose — training stays
bf16/fp32; quantization happens once at export,
``vit_tpu.serve.export --quantize int8``).

Error model: symmetric 127-level quantization of both operands gives a
per-matmul relative RMS error of ~1%, compounding over depth; the export path
records decode-PSNR-vs-fp in the manifest so the accuracy cost is visible at
deploy time (tests/test_quant.py pins the tolerances).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_EPS = 1e-8


def quantize_kernel(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric quantization of a (K, N) Dense kernel.

    Returns (kernel_q int8 (K, N), scale f32 (N,)) with
    ``w ≈ kernel_q.astype(f32) * scale[None, :]``.
    """
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0)
    scale = jnp.maximum(absmax, _EPS) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x: jax.Array, kernel_q: jax.Array,
                scale: jax.Array) -> jax.Array:
    """x (..., K) float → (..., N) f32 via an int8×int8→int32 MXU matmul.

    The activation is quantized dynamically per row (symmetric absmax over the
    contraction axis) so no calibration data is needed; the per-row activation
    scale and per-column weight scale factorize exactly out of the int32
    accumulator.
    """
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s_x = jnp.maximum(absmax, _EPS) / 127.0
    x_q = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, kernel_q,
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * s_x * scale


class QuantDense(nn.Module):
    """Dense with an int8 kernel + per-channel scale (serving-only).

    Same call signature and bias semantics as ``utils.init.dense``; the param
    tree is {kernel_q, scale, bias} and is produced from a trained fp tree by
    ``quantize_params`` — init values are placeholders, never trained.
    """

    features: int
    fan_in: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (self.fan_in, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        y = int8_matmul(x, kernel_q, scale)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


class QuantProjParams(nn.Module):
    """Quantized analogue of core.transformer._ProjParams: exposes the raw
    (kernel_q, scale, bias) so callers that apply kernel and bias separately
    (the packed attention adds the qkv bias in-kernel) keep that structure."""

    features: int
    fan_in: int

    @nn.compact
    def __call__(self):
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (self.fan_in, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel_q, scale, bias


def quantize_params(target_tree, params_fp):
    """Fill a quantized model's param tree from a trained fp tree.

    ``target_tree`` is the quantized model's param structure (arrays or
    ShapeDtypeStructs, e.g. from ``jax.eval_shape(net_q.init, ...)``); at every
    dict level containing ``kernel_q`` the source's ``kernel`` is quantized
    into (kernel_q, scale); every other leaf is copied verbatim. A ``scale``
    key NOT siblinged by ``kernel_q`` (affine LayerNorm) copies through.
    """

    def build(tgt, src):
        if not isinstance(tgt, dict):
            if tgt.shape != jnp.shape(src):
                raise ValueError(
                    f"param shape mismatch: target {tgt.shape} vs "
                    f"source {jnp.shape(src)}")
            return src
        out = {}
        quant_site = "kernel_q" in tgt
        kq = sc = None
        if quant_site:
            if "kernel" not in src:
                raise ValueError(
                    f"quantized site expects a source 'kernel'; source keys: "
                    f"{sorted(src)}")
            kq, sc = quantize_kernel(src["kernel"])
        for k, v in tgt.items():
            if quant_site and k == "kernel_q":
                out[k] = kq
            elif quant_site and k == "scale":
                out[k] = sc
            else:
                out[k] = build(v, src[k])
        return out

    return build(target_tree, params_fp)


@jax.custom_vjp
def frozen_int8_dense(x, w, b):
    """Dense through int8×int8→int32 MXU matmuls for FROZEN weights inside a
    trained graph (the perceptual net, --perceptual_quant int8 — VERDICT r3
    next #1). Forward: exact-once per-step weight quantization + the dynamic
    per-row activation scheme of int8_matmul. Backward: dx only (the net is
    frozen by contract — reference perceptual_loss.py:44-47), itself an int8
    matmul against the transposed kernel with its own per-channel scales;
    the activation-quantization gradient is straight-through."""
    wq, ws = quantize_kernel(w)
    return int8_matmul(x, wq, ws) + b.astype(jnp.float32)


def _frozen_int8_fwd(x, w, b):
    wq, ws = quantize_kernel(w)
    # residuals must be JAX types: carry the primal dtype as a 0-size array
    return (int8_matmul(x, wq, ws) + b.astype(jnp.float32),
            (w, b, jnp.zeros((0,), x.dtype)))


def _frozen_int8_bwd(res, dy):
    # NOTE: Wᵀ is re-quantized here with fresh per-channel scales (channel axis
    # differs after the transpose), so dx is an independent ~1%-error int8
    # approximation of dy·Wᵀ — NOT the exact VJP of the quantized forward.
    # Acceptable for this frozen, default-off path (the perceptual net
    # contributes a loss term, not trained weights; tolerance-tested in
    # tests/test_quant.py); an exact VJP would need the forward's wq/ws reused
    # with a transposed contraction. Same approximation in the fused
    # kernels/convnext_block.py _bwd_kernel_q8.
    w, b, x_proto = res
    x_dtype = x_proto.dtype
    wtq, wts = quantize_kernel(jnp.swapaxes(w, 0, 1))
    # cotangent dtype must match the primal's (e.g. bf16 activations feeding
    # the f32 int8_matmul output) or downstream VJPs see mixed-dtype muls
    dx = int8_matmul(dy, wtq, wts).astype(x_dtype)
    return dx, jnp.zeros_like(w), jnp.zeros_like(b)


frozen_int8_dense.defvjp(_frozen_int8_fwd, _frozen_int8_bwd)
