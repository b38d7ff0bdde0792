"""ConvNeXt-S perceptual loss (reference perceptual_loss.py:27-70).

The reference compares the torchvision ConvNeXt-Small classifier logits of the two
images (after bilinear+antialias resize to 224 and ImageNet normalization) with MSE.
This is a faithful Flax rebuild of that architecture, running on-chip inside the jitted
loss (no host round-trip, unlike the reference's separate frozen torch module).

Weights: this environment has no torchvision and no network egress, so pretrained
ImageNet weights cannot be materialized here. The module supports
  (a) loading converted weights from an .npz produced by
      scripts/convert_perceptual_weights.py (run it anywhere torchvision is available), or
  (b) deterministic random initialization (``init_params``) — architecture-correct,
      useful for smoke/perf runs; reconstruction-parity evaluation requires (a).
"""

from __future__ import annotations


from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vit_tpu.ops.gelu import gelu as gelu_op

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# ConvNeXt-Small (torchvision convnext_small): depths / widths
CONVNEXT_S_DEPTHS = (3, 3, 27, 3)
CONVNEXT_S_DIMS = (96, 192, 384, 768)


class DWConv7(nn.Module):
    """7×7 depthwise conv with nn.Conv-compatible params (kernel (7,7,1,C), bias (C,)).

    impl="lax" (default): XLA grouped conv. impl="pallas" dispatches to the fused
    kernel in vit_tpu/kernels/depthwise.py — measured SLOWER end-to-end on this
    bandwidth-limited chip (170.8 vs 187.0 img/s headline) because the custom-VJP
    weight-gradient reduction outweighs the forward win; kept as groundwork with
    parity tests for revisit on full-bandwidth parts."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    impl: str = "lax"
    layout: str = "nhwc"  # "hwnc": x is (H, W, B, C), batch-innermost

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 1, self.dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        if self.impl == "pallas":
            assert self.layout == "nhwc", "pallas depthwise is NHWC-only"
            from vit_tpu.kernels.depthwise import depthwise_conv

            return depthwise_conv(x.astype(self.dtype),
                                  kernel[:, :, 0, :].astype(self.dtype),
                                  bias.astype(self.dtype), 7)
        dn = _DIMNUMS[self.layout]
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            [(3, 3), (3, 3)], dimension_numbers=dn,
            feature_group_count=self.dim)
        return out + bias.astype(out.dtype)


# Conv dimension_numbers per activation layout. "hwnc" is the TPU-preferred
# batch-innermost layout: the profiled XLA conv fusions pick a {C-minor,
# B-next} layout internally (C on lanes, B on sublanes — every kernel tap is
# free-dim indexing, no register shifts), then pay a copy back to the default
# {3,2,1,0} layout at each boundary with the layout-pinning Pallas block-tail
# custom-calls (8.2 ms/step "data formatting" on the flagship, /tmp/r3stats).
# Feeding the convs (H, W, B, C) activations makes the default layout BE the
# conv-preferred one; every op between convs is rowwise on C and never cares
# about row order.
_DIMNUMS = {"nhwc": ("NHWC", "HWIO", "NHWC"),
            "hwnc": ("HWNC", "HWIO", "HWNC")}


class _ConvParams(nn.Module):
    """Param holder matching nn.Conv's tree ({kernel, bias}) for explicit-layout
    lax convs (kernel HWIO, identical init)."""

    ksize: tuple
    din: int
    dout: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (*self.ksize, self.din, self.dout), jnp.float32),
                self.param("bias", nn.initializers.zeros, (self.dout,),
                           jnp.float32))


class _LNParams(nn.Module):
    """Param holder matching nn.LayerNorm's tree ({scale, bias}) for the fused path."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _DenseParams(nn.Module):
    """Param holder matching nn.Dense's tree ({kernel, bias}) for the fused path."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (self.din, self.dout)),
                self.param("bias", nn.initializers.zeros, (self.dout,)))


class ConvNeXtBlock(nn.Module):
    """7×7 depthwise conv → LN → 4× MLP with GELU → layer-scale, residual.

    mlp_impl: "fused" runs LN→pwconv1→GELU→pwconv2→γ→residual as ONE Pallas
    kernel (vit_tpu/kernels/convnext_block.py — VMEM-resident (N,4C) intermediate,
    no LN-stats HBM pass; valid ONLY for the frozen perceptual use: parameter
    gradients are zero by contract). "xla" is the reference-shaped unfused path.
    "auto" (default) = fused on the TPU backend where C ≤ 384, xla elsewhere
    (interpret-mode fusion on the CPU test mesh would be needlessly slow for the
    full 36-block net; the kernel itself is parity-tested in interpret mode)."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    dw_impl: str = "lax"
    mlp_impl: str = "auto"
    layout: str = "nhwc"
    quant: str = "none"  # "int8": frozen-net pwconv GEMMs on the int8 MXU path

    @nn.compact
    def __call__(self, x):
        h = DWConv7(self.dim, dtype=self.dtype, impl=self.dw_impl,
                    layout=self.layout, name="dwconv")(x)
        from vit_tpu.kernels._partition import force_xla_kernels
        from vit_tpu.kernels.convnext_block import (
            frozen_convnext_block_tail, fused_supported)

        use_fused = (self.mlp_impl == "fused"
                     or (self.mlp_impl == "auto"
                         and jax.default_backend() == "tpu"
                         and not force_xla_kernels()))
        # Everything below the dwconv is rowwise on C: a (rows, C) flatten is
        # valid in either activation layout (row order is irrelevant as long as
        # h, the residual x, and the output reshape agree).
        shape = h.shape
        c = shape[-1]
        if use_fused and fused_supported(c, 4 * c):
            lns, lnb = _LNParams(c, name="norm")()
            w1, b1 = _DenseParams(c, 4 * c, name="pwconv1")()
            w2, b2 = _DenseParams(4 * c, c, name="pwconv2")()
            gamma = self.param("gamma", nn.initializers.constant(1e-6),
                               (self.dim,), jnp.float32)
            y = frozen_convnext_block_tail(
                h.reshape(-1, c),
                x.astype(h.dtype).reshape(-1, c),
                lns, lnb, w1, b1, w2, b2, gamma, eps=1e-6,
                quant=self.quant)
            return y.reshape(shape)
        # LN output in compute dtype (flax upcasts half dtypes to fp32 for the
        # statistics) — fp32 LN outputs doubled HBM traffic on this
        # bandwidth-bound net for no accuracy benefit.
        # The LN→MLP runs on an explicit (B·H·W, C) 2-D view: the depthwise
        # conv's spatial layout otherwise propagates into the pointwise matmuls
        # and fragments their M dimension (profiled at ~34 TF/s vs ~150 on the
        # transformer's matmuls); the flatten puts a layout boundary there.
        h = h.reshape(-1, c)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        if self.quant == "int8":
            # stage-3 blocks (C=768, beyond the fused kernel's VMEM gate) on
            # the XLA int8 path: same exact-once weight quantization, dynamic
            # per-row activation scales, STE backward (frozen net — no dW)
            from vit_tpu.core.quant import frozen_int8_dense

            w1, b1 = _DenseParams(c, 4 * c, name="pwconv1")()
            w2, b2 = _DenseParams(4 * c, c, name="pwconv2")()
            h = frozen_int8_dense(h, w1, b1)
            h = gelu_op(h.astype(self.dtype))  # tanh_erf default: exact-erf at bf16 resolution, no VPU divide (ops/gelu.py)
            h = frozen_int8_dense(h, w2, b2).astype(self.dtype)
        else:
            h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(h)
            h = gelu_op(h)
            h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        h = h.reshape(shape)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,),
                           jnp.float32)
        return x + gamma.astype(h.dtype) * h


class ConvNeXt(nn.Module):
    """ConvNeXt classifier, NHWC. Defaults = ConvNeXt-Small."""

    depths: Sequence[int] = CONVNEXT_S_DEPTHS
    dims: Sequence[int] = CONVNEXT_S_DIMS
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32
    dw_impl: str = "lax"
    mlp_impl: str = "auto"
    layout: str = "nhwc"  # "hwnc": input is (H, W, B, C), batch-innermost
    quant: str = "none"  # "int8": frozen-net GEMMs on the int8 MXU path

    def _conv(self, x, ksize, din, dout, name):
        """Strided conv with nn.Conv's exact param tree, explicit layout."""
        kernel, bias = _ConvParams(ksize, din, dout, name=name)()
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), ksize, "VALID",
            dimension_numbers=_DIMNUMS[self.layout])
        return out + bias.astype(out.dtype)

    @nn.compact
    def __call__(self, x):
        # stem: 4×4 stride-4 conv + LN (channels-last here)
        x = self._conv(x, (4, 4), x.shape[-1], self.dims[0], "stem_conv")
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"downsample_norm_{stage}")(x)
                x = self._conv(x, (2, 2), self.dims[stage - 1], dim,
                               f"downsample_conv_{stage}")
            for block in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype, dw_impl=self.dw_impl,
                                  mlp_impl=self.mlp_impl, layout=self.layout,
                                  quant=self.quant,
                                  name=f"stage{stage}_block{block}")(x)
        # global average pool over the spatial axes of the active layout
        x = jnp.mean(x, axis=(1, 2) if self.layout == "nhwc" else (0, 1))
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="head_norm")(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(x)


class PerceptualLoss:
    """Frozen ConvNeXt-S logit-matching loss (reference perceptual_loss.py:56-70)."""

    def __init__(self, params=None, *, dtype=jnp.float32, dw_impl="lax",
                 mlp_impl="auto", layout="auto", quant="none"):
        # dw_impl: "lax" (default) or "pallas". The Pallas depthwise now has a
        # fully fused backward (kernels/depthwise.py) but measured SLOWER
        # in-context on this chip (flagship profile r2: 69.9 ms/step pallas
        # fwd+bwd vs ~35 ms lax; re-measured round 3 standalone: 74.6 vs 23.4
        # ms, scripts/bench_dwconv.py) — the 49-tap MAC loop pays a sublane
        # relayout per tap while XLA's conv picks a batch-on-sublanes layout
        # with free-dim taps. Kept switchable for revisit.
        # layout: "hwnc" runs the net batch-innermost ((H, W, B, C), conv
        # dimension_numbers HWNC) so the default layout matches the physical
        # order XLA's NHWC convs pick internally ({3,0,2,1}: C on lanes, B on
        # sublanes). MEASURED NEUTRAL on the flagship (round 3): it does
        # eliminate the 8.2 ms/step of boundary copies against the
        # layout-pinning block-tail custom-calls (data formatting 8.22 → 0.50
        # ms, xprof), but XLA's HWNC conv emitter is correspondingly slower
        # (convolution-fusion self-time +8.25 ms) — net 261.7 vs 262.2 img/s.
        # "auto" therefore stays NHWC everywhere; hwnc is kept exact-parity-
        # tested (tests/test_perceptual_hwnc.py) for conv emitters where the
        # trade differs.
        if layout == "auto":
            layout = "nhwc"
        self.layout = layout
        # quant="int8" (--perceptual_quant int8): the frozen net's pwconv
        # GEMMs run int8×int8→int32 on the MXU (2× bf16 peak) — fused-kernel
        # int8 variants for stages 0-2, XLA int8 dense for stage 3. The loss
        # SEMANTICS are unchanged (logit MSE, reference perceptual_loss.py:
        # 27-70); only the frozen net's arithmetic changes. Loss-curve parity
        # is A/B-validated like the bf16-mu switch (BENCHMARKS.md).
        self.model = ConvNeXt(dtype=dtype, dw_impl=dw_impl, mlp_impl=mlp_impl,
                              layout=layout, quant=quant)
        self.params = params

    @staticmethod
    def init_params(seed: int = 0):
        model = ConvNeXt()
        return model.init(jax.random.PRNGKey(seed),
                          jnp.zeros((1, 224, 224, 3)))["params"]

    @staticmethod
    def load_params(path: str):
        """Load weights converted by scripts/convert_perceptual_weights.py (.npz of
        flattened 'a/b/c' → array entries)."""
        flat = dict(np.load(path))
        tree: dict = {}
        for key, value in flat.items():
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(value)
        return tree

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """x, y: (B, H, W, 3) NHWC in [0, 1] → scalar MSE between logits."""
        if self.params is None:
            raise ValueError("PerceptualLoss has no params; pass converted weights "
                             "or PerceptualLoss.init_params()")

        def prep(img):
            from vit_tpu.losses.resize import resize_bilinear_antialias

            # Two-matmul antialiased bilinear resize — equals jax.image.resize /
            # F.interpolate(..., antialias=True) to ~1e-5 (reference
            # perceptual_loss.py:61-62) but stays on the MXU. In a half-precision
            # net the resize runs in that dtype too (halves 224² HBM traffic).
            dt = self.model.dtype
            # out_layout=hwnc: the resize's final einsum writes the
            # batch-innermost layout directly — the transpose is free.
            # (getattr: tests construct PerceptualLoss via __new__ with a
            # hand-built model; default to the model's layout.)
            layout = getattr(self, "layout",
                             getattr(self.model, "layout", "nhwc"))
            img = resize_bilinear_antialias(img.astype(dt), 224, 224,
                                            out_layout=layout)
            mean = jnp.asarray(IMAGENET_MEAN, dt)
            std = jnp.asarray(IMAGENET_STD, dt)
            return (img - mean) / std

        logits_x = self.model.apply({"params": self.params}, prep(x))
        logits_y = self.model.apply({"params": self.params}, prep(y))
        return jnp.mean((logits_x - logits_y) ** 2)
