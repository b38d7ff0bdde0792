"""Golden parity: Flax ConvNeXt-S vs a hand-built torch ConvNeXt-S forward.

The reference's perceptual loss is torchvision ``convnext_small`` logits
(reference perceptual_loss.py:27-70). This environment has no torchvision and no
egress, so we can't materialize IMAGENET1K_V1 weights — instead we prove the port:
build the exact torchvision ConvNeXt-Small architecture in raw torch (state_dict
keys match torchvision's), share ONE set of random weights through
scripts/convert_perceptual_weights.convert + the .npz load path, and assert logits
agree. Dropping in real pretrained weights is then a zero-risk file swap.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/scripts")


class _Permute(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.dims = dims

    def forward(self, x):
        return x.permute(self.dims)


class _LayerNorm2d(nn.LayerNorm):
    """torchvision.ops.misc LayerNorm2d: LN over C of an NCHW tensor."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class _CNBlock(nn.Module):
    """torchvision ConvNeXt block (eval mode: stochastic depth = identity)."""

    def __init__(self, dim):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True),
            _Permute([0, 2, 3, 1]),
            nn.LayerNorm(dim, eps=1e-6),
            nn.Linear(dim, 4 * dim),
            nn.GELU(),
            nn.Linear(4 * dim, dim),
            _Permute([0, 3, 1, 2]),
        )
        self.layer_scale = nn.Parameter(torch.full((dim, 1, 1), 1e-6))

    def forward(self, x):
        return x + self.layer_scale * self.block(x)


def _torch_convnext(depths, dims, num_classes=1000):
    """torchvision convnext layout: features[0]=stem, [1,3,5,7]=stages,
    [2,4,6]=downsample; classifier=[LayerNorm2d, Flatten, Linear]."""
    features = [nn.Sequential(nn.Conv2d(3, dims[0], 4, stride=4),
                              _LayerNorm2d(dims[0], eps=1e-6))]
    for stage, (depth, dim) in enumerate(zip(depths, dims)):
        if stage > 0:
            features.append(nn.Sequential(
                _LayerNorm2d(dims[stage - 1], eps=1e-6),
                nn.Conv2d(dims[stage - 1], dim, 2, stride=2)))
        features.append(nn.Sequential(*[_CNBlock(dim) for _ in range(depth)]))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*features)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.classifier = nn.Sequential(
                _LayerNorm2d(dims[-1], eps=1e-6), nn.Flatten(1),
                nn.Linear(dims[-1], num_classes))

        def forward(self, x):
            return self.classifier(self.avgpool(self.features(x)))

    return Net()


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


@pytest.mark.parametrize("dtype", [jnp.float32])
def test_convnext_s_golden_vs_torch(dtype, tmp_path):
    from convert_perceptual_weights import convert

    from vit_tpu.losses.perceptual import ConvNeXt, PerceptualLoss

    tmodel = _torch_convnext((3, 3, 27, 3), (96, 192, 384, 768)).eval()
    _randomize(tmodel)

    npz = tmp_path / "convnext_random.npz"
    np.savez(npz, **convert(tmodel.state_dict()))
    params = PerceptualLoss.load_params(str(npz))

    x = np.random.default_rng(1).uniform(-1, 1, (2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    model = ConvNeXt(dtype=dtype, dw_impl="lax")
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_load_params_matches_init_structure(tmp_path):
    """The .npz load path yields exactly the tree the Flax model expects."""
    from convert_perceptual_weights import convert

    from vit_tpu.losses.perceptual import ConvNeXt, PerceptualLoss

    tmodel = _torch_convnext((3, 3, 27, 3), (96, 192, 384, 768)).eval()
    npz = tmp_path / "w.npz"
    np.savez(npz, **convert(tmodel.state_dict()))
    loaded = PerceptualLoss.load_params(str(npz))

    ref = jax.eval_shape(
        lambda: ConvNeXt().init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 224, 224, 3))))["params"]
    flat_ref = jax.tree_util.tree_leaves_with_path(ref)
    flat_got = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(loaded)}
    assert len(flat_ref) == len(flat_got)
    for k, v in flat_ref:
        ks = jax.tree_util.keystr(k)
        assert ks in flat_got, ks
        assert flat_got[ks].shape == v.shape, (ks, flat_got[ks].shape, v.shape)
