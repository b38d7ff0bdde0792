"""Official-source constant/form pins (VERDICT r4 weak #5 / next #6).

The golden tests elsewhere compare against hand-built torch TWINS constructed
from the same reading of the official sources — round 4's LPIPS eps-placement
fix (commit 1c1d813) proved both twin and implementation can be wrong
TOGETHER and stay green. These tests de-circularize the legs where official
constants and closed-form geometry exist: each assert pins a value or a
formula against its cited upstream source, with NO torch twin in the loop.
docs/PARITY.md's provenance table says per leg whether parity is
official-source-pinned (this file / an independent third-party oracle) or
twin-only.
"""

import inspect

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# LPIPS (Zhang et al. 2018, richzhang/PerceptualSimilarity)
# ---------------------------------------------------------------------------


def test_lpips_scaling_layer_constants():
    """ScalingLayer registers shift [-.030, -.088, -.188] and scale
    [.458, .448, .450] (richzhang/PerceptualSimilarity lpips/lpips.py,
    class ScalingLayer.__init__; v0.1 weights, inputs in [-1, 1])."""
    from vit_tpu.losses.lpips import LPIPS_SCALE, LPIPS_SHIFT

    assert LPIPS_SHIFT == (-0.030, -0.088, -0.188)
    assert LPIPS_SCALE == (0.458, 0.448, 0.450)


def test_lpips_normalize_tensor_eps_on_norm():
    """normalize_tensor(in_feat, eps=1e-10) divides by (norm + eps), NOT by
    sqrt(square_sum + eps) (richzhang/PerceptualSimilarity lpips/__init__.py).
    The forms differ measurably when ||f|| ~ eps; this pins the correct one
    with independent numpy arithmetic."""
    from vit_tpu.losses.lpips import LPIPS_NORM_EPS, unit_normalize

    assert LPIPS_NORM_EPS == 1e-10

    f = np.array([[3e-10, 4e-10, 0.0]], np.float64)  # ||f|| = 5e-10 ~ eps
    got = np.asarray(unit_normalize(jnp.asarray(f)), np.float64)
    norm = np.sqrt((f ** 2).sum(-1, keepdims=True))
    eps_on_norm = f / (norm + 1e-10)
    eps_in_sqrt = f / np.sqrt((f ** 2).sum(-1, keepdims=True) + 1e-10)
    assert np.allclose(got, eps_on_norm, rtol=1e-5)
    # the wrong (round-4) placement is ~4 orders of magnitude off here
    assert not np.allclose(got, eps_in_sqrt, rtol=0.5)

    # exact-zero features normalize to zero, no NaN/Inf
    z = np.asarray(unit_normalize(jnp.zeros((2, 3))))
    assert np.all(z == 0.0)


def test_lpips_input_convention_and_head_form():
    """LPIPS consumes [-1, 1] images (this module converts from [0, 1]) and
    d(x, x) == 0 exactly: unit-normalized identical taps cancel before the
    nonnegative 1x1 heads (official eq. 1, Zhang et al. 2018 §3.1)."""
    import jax

    from vit_tpu.losses.lpips import LPIPS

    model = LPIPS()
    x = jnp.linspace(0.0, 1.0, 2 * 35 * 35 * 3).reshape(2, 35, 35, 3)
    params = model.init(jax.random.PRNGKey(0), x, x)["params"]
    d = model.apply({"params": params}, x, x)
    assert d.shape == (2,)
    assert np.allclose(np.asarray(d), 0.0, atol=1e-12)


def test_alexnet_feature_geometry():
    """torchvision AlexNet ``features``: conv(64,k11,s4,p2) → conv(192,k5,p2)
    → conv(384,k3,p1) → conv(256,k3,p1) → conv(256,k3,p1), ReLU after each,
    MaxPool(3,2) after relu1 and relu2 (torchvision/models/alexnet.py,
    AlexNet.features — the pool after relu5 sits below LPIPS's deepest tap).
    Channel counts pinned verbatim; spatial sizes of the five taps for a
    224-input computed with the independent conv-arithmetic formula
    floor((n + 2p − k)/s) + 1."""
    from vit_tpu.losses.lpips import ALEXNET_CONVS, _POOL_AFTER, AlexNetFeatures

    assert ALEXNET_CONVS == ((64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
                             (256, 3, 1, 1), (256, 3, 1, 1))
    assert _POOL_AFTER == (0, 1)

    def conv_out(n, k, s, p):
        return (n + 2 * p - k) // s + 1

    n, want = 224, []
    for i, (ch, k, s, p) in enumerate(ALEXNET_CONVS):
        n = conv_out(n, k, s, p)
        want.append((n, ch))
        if i in _POOL_AFTER:
            n = conv_out(n, 3, 2, 0)
    # official AlexNet tap sizes at 224: relu1 55, relu2 27, relu3-5 13
    assert [h for h, _ in want] == [55, 27, 13, 13, 13]

    import jax

    taps = AlexNetFeatures().init_with_output(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))[0]
    assert [(t.shape[1], t.shape[3]) for t in taps] == want


# ---------------------------------------------------------------------------
# Perceptual loss (reference perceptual_loss.py) / ConvNeXt-S
# ---------------------------------------------------------------------------


def test_imagenet_normalization_constants():
    """ImageNet mean/std used by every torchvision classification transform
    (torchvision docs: mean [0.485, 0.456, 0.406], std [0.229, 0.224, 0.225];
    reference perceptual_loss.py applies exactly these before ConvNeXt)."""
    from vit_tpu.losses.perceptual import IMAGENET_MEAN, IMAGENET_STD

    assert IMAGENET_MEAN == (0.485, 0.456, 0.406)
    assert IMAGENET_STD == (0.229, 0.224, 0.225)


def test_convnext_small_stage_geometry():
    """ConvNeXt-S: depths (3, 3, 27, 3), widths (96, 192, 384, 768)
    (Liu et al. 2022 'A ConvNet for the 2020s' §3 model configurations;
    torchvision convnext_small block_setting)."""
    from vit_tpu.losses.perceptual import CONVNEXT_S_DEPTHS, CONVNEXT_S_DIMS

    assert CONVNEXT_S_DEPTHS == (3, 3, 27, 3)
    assert CONVNEXT_S_DIMS == (96, 192, 384, 768)


def test_convnext_block_form_constants():
    """ConvNeXt block: 7x7 depthwise conv, LayerNorm eps 1e-6, 4x MLP
    expansion, GELU (Liu et al. 2022 §2.6/Fig. 4). Pinned from the module's
    own config surface rather than a twin forward."""
    from vit_tpu.losses import perceptual as P

    src = inspect.getsource(P)
    # 7x7 depthwise + eps are structural (string-pin: no config knob exists)
    assert "(7, 7)" in src or "7×7" in src
    assert "epsilon=1e-6" in src


def test_ssim_reference_constants():
    """SSIM (Wang et al. 2004 §III.B): 11x11 Gaussian window, sigma 1.5,
    K1 = 0.01, K2 = 0.03."""
    from vit_tpu.utils.metrics import ssim

    sig = inspect.signature(ssim)
    assert sig.parameters["window_size"].default == 11
    assert sig.parameters["sigma"].default == 1.5
    src = inspect.getsource(ssim)
    assert "0.01" in src and "0.03" in src


def test_resize_matches_independent_oracle():
    """The two-matmul antialiased resize is verified against jax.image.resize
    (an INDEPENDENT third-party implementation of the Pillow antialias
    convention the reference hits via torchvision, perceptual_loss.py:61-62)
    — an official-grade oracle, not a twin. (Duplicates
    test_titok.py::test_matmul_resize_matches_jax_image_resize at a second
    size so the provenance table can cite one standalone file.)"""
    import jax

    from vit_tpu.losses.resize import resize_bilinear_antialias

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 48, 48, 3), np.float32))
    got = resize_bilinear_antialias(img, 20, 20)
    want = jax.image.resize(img, (2, 20, 20, 3), "bilinear", antialias=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-6)


# ---------------------------------------------------------------------------
# Reference-repo constants (from /root/reference, the spec itself)
# ---------------------------------------------------------------------------


def test_vq_commitment_beta():
    """Both VQ implementations weight the commitment term by 0.25
    (reference train_titok.py:57-58; blocks.py:411 commitment_cost default)."""
    src = inspect.getsource(__import__("vit_tpu.quantize.vq",
                                       fromlist=["vq"]))
    assert "0.25" in src
    from vit_tpu.quantize.bytedance_vq import BytedanceVectorQuantizer

    assert BytedanceVectorQuantizer.commitment_cost == 0.25


def test_transformer_size_presets():
    """S/B/L presets: S=6L/8H/512, B=12L/12H/768, L=24L/16H/1024
    (reference transformer.py:56-58); Bytedance small=8L/8H/512
    (blocks.py:219-233)."""
    from vit_tpu.core.config import transformer_configs

    s, b, l = (transformer_configs[k](block_size=64) for k in ("S", "B", "L"))
    assert (s.n_layers, s.n_heads, s.n_embd) == (6, 8, 512)
    assert (b.n_layers, b.n_heads, b.n_embd) == (12, 12, 768)
    assert (l.n_layers, l.n_heads, l.n_embd) == (24, 16, 1024)

    from vit_tpu.core.config import (BYTEDANCE_HEADS, BYTEDANCE_LAYERS,
                                     BYTEDANCE_WIDTH)

    assert (BYTEDANCE_LAYERS["small"], BYTEDANCE_HEADS["small"],
            BYTEDANCE_WIDTH["small"]) == (8, 8, 512)
    assert (BYTEDANCE_LAYERS["base"], BYTEDANCE_HEADS["base"],
            BYTEDANCE_WIDTH["base"]) == (12, 12, 768)
    assert (BYTEDANCE_LAYERS["large"], BYTEDANCE_HEADS["large"],
            BYTEDANCE_WIDTH["large"]) == (24, 16, 1024)
