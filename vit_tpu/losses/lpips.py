"""LPIPS perceptual metric (AlexNet trunk + linear calibration heads).

The reference imports ``lpips`` at train_titok.py:1 but never calls it
(SURVEY.md §2d.8 — evidently planned), and BASELINE.md's north star names
"recon PSNR/LPIPS parity" explicitly — so the metric architecture lives here
even though pretrained weights cannot be materialized in this environment
(no torchvision / no egress, same constraint as losses/perceptual.py).

Faithful rebuild of the official LPIPS formulation (Zhang et al. 2018,
richzhang/PerceptualSimilarity, the ``lpips`` pip package the reference
imports):

    d(x, y) = sum_l  mean_hw  || w_l ⊙ ( ê_l(x) − ê_l(y) ) ||²

where ê_l are channel-unit-normalized activations tapped at AlexNet's five
ReLU stages (relu1..relu5) and w_l are learned nonnegative 1×1 "linear"
heads. Inputs are RGB in [-1, 1], normalized by LPIPS's fixed shift/scale.

Weights: convert torchvision ``alexnet(weights=IMAGENET1K_V1)`` + the lpips
package's ``lin*.model.1.weight`` heads anywhere they are installed with
scripts/convert_lpips_weights.py, then pass the .npz via ``--lpips_weights``
(eval_recon.py). Architecture + converter are golden-tested against a
hand-built torch twin (tests/test_lpips_golden.py) so dropping in real
weights is a zero-risk file swap.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# official LPIPS ScalingLayer constants (inputs in [-1, 1]) — pinned verbatim
# from richzhang/PerceptualSimilarity lpips/lpips.py ScalingLayer.__init__
# ('shift' [-.030, -.088, -.188], 'scale' [.458, .448, .450]); standalone
# assert in tests/test_official_constants.py (not twin-derived)
LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)
LPIPS_NORM_EPS = 1e-10


def unit_normalize(f, eps: float = LPIPS_NORM_EPS):
    """Channel-unit normalization, official LPIPS ``normalize_tensor`` form:
    ``f / (sqrt(sum_c f²) + eps)`` — eps is added to the NORM, not the square
    sum (richzhang/PerceptualSimilarity lpips/__init__.py normalize_tensor).
    The two placements differ measurably for small-norm features; round 4
    shipped the wrong one with a matching twin, so the form is pinned by a
    standalone test (tests/test_official_constants.py), not only the golden."""
    norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True))
    return f / (norm + eps)

# torchvision AlexNet features: (out_ch, ksize, stride, padding), ReLU after
# each conv; MaxPool(3, 2) after relu1, relu2 and relu5 (the last pool is
# below the deepest LPIPS tap and therefore omitted here).
ALEXNET_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_POOL_AFTER = (0, 1)  # maxpool follows these conv indices (pre-tap next conv)


class AlexNetFeatures(nn.Module):
    """Five-tap AlexNet trunk (NHWC): returns [relu1..relu5] activations."""

    convs: Sequence = ALEXNET_CONVS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        for i, (ch, k, s, p) in enumerate(self.convs):
            x = nn.Conv(ch, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
            taps.append(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """LPIPS distance module. ``__call__(x, y)`` with NHWC images in [0, 1]
    (converted to the official [-1, 1] convention internally) → (B,) distances."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(LPIPS_SHIFT, self.dtype)
        scale = jnp.asarray(LPIPS_SCALE, self.dtype)

        def prep(img):
            img = img.astype(self.dtype) * 2.0 - 1.0  # [0,1] → [-1,1]
            return (img - shift) / scale

        net = AlexNetFeatures(dtype=self.dtype, name="alex")
        feats_x = net(prep(x))
        feats_y = net(prep(y))

        total = 0.0
        for i, (fx, fy) in enumerate(zip(feats_x, feats_y)):
            diff2 = jnp.square(unit_normalize(fx) - unit_normalize(fy))
            # 1×1 nonneg "linear" head, no bias — stored as (C,) weights
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (diff2.shape[-1],), jnp.float32)
            total = total + jnp.mean(
                jnp.sum(diff2 * w.astype(diff2.dtype), axis=-1), axis=(1, 2))
        return total


def init_params(seed: int = 0):
    """Architecture-correct random params (smoke/perf only — NOT comparable to
    published LPIPS numbers; see module docstring)."""
    model = LPIPS()
    return model.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))["params"]


def load_params(path: str):
    """Load weights converted by scripts/convert_lpips_weights.py (.npz of
    flattened 'a/b/c' → array entries, same format as PerceptualLoss)."""
    flat = dict(np.load(path))
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def lpips_fn(params, *, dtype=jnp.float32):
    """Jittable (x, y) → (B,) LPIPS distances closure over loaded params."""
    model = LPIPS(dtype=dtype)

    def fn(x, y):
        return model.apply({"params": params}, x, y)

    return fn
