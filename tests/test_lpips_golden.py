"""Golden parity: Flax LPIPS (AlexNet trunk + linear heads) vs a hand-built
torch twin of the official formulation (richzhang/PerceptualSimilarity — the
``lpips`` package the reference imports at train_titok.py:1 and never calls).

Same pattern as tests/test_perceptual_golden.py: no torchvision/lpips in this
environment, so the torch twin replicates their exact module layout and
state_dict key names, one set of random weights flows through
scripts/convert_lpips_weights.convert + the .npz load path, and the outputs
must agree — making real pretrained weights a zero-risk file swap.
"""

import sys

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/scripts")


def _torch_alexnet_features():
    """torchvision alexnet ``features`` (eval): taps at ReLU indices 1,4,7,9,11."""
    return nn.Sequential(
        nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(),            # 0,1
        nn.MaxPool2d(3, 2),                                              # 2
        nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(),                     # 3,4
        nn.MaxPool2d(3, 2),                                              # 5
        nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),                    # 6,7
        nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),                    # 8,9
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),                    # 10,11
        nn.MaxPool2d(3, 2),                                              # 12
    )


_TAPS = (1, 4, 7, 9, 11)
_LIN_DIMS = (64, 192, 384, 256, 256)


class _TorchLPIPS(nn.Module):
    """Official LPIPS forward (alex, spatial=False, eval): ScalingLayer →
    five-tap trunk → unit-normalize → diff² → 1×1 bias-free heads →
    spatial average → sum over layers."""

    def __init__(self):
        super().__init__()
        self.features = _torch_alexnet_features()
        self.lins = nn.ModuleList(
            [nn.Conv2d(c, 1, 1, bias=False) for c in _LIN_DIMS])
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def _taps(self, x):
        taps, h = [], x
        for i, layer in enumerate(self.features):
            h = layer(h)
            if i in _TAPS:
                taps.append(h)
        return taps

    def forward(self, x, y):
        # inputs NCHW in [-1, 1]
        x = (x - self.shift) / self.scale
        y = (y - self.shift) / self.scale
        total = 0.0
        for fx, fy, lin in zip(self._taps(x), self._taps(y), self.lins):
            def unit(f):
                # official lpips normalize_tensor: eps on the NORM
                norm = torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True))
                return f / (norm + 1e-10)

            d = lin((unit(fx) - unit(fy)) ** 2)
            total = total + d.mean(dim=(2, 3)).squeeze(1)
        return total


def _alexnet_sd(twin):
    """Torch twin features → torchvision alexnet state_dict key names."""
    sd = {}
    for conv_i, feat_i in enumerate((0, 3, 6, 8, 10)):
        layer = twin.features[feat_i]
        sd[f"features.{feat_i}.weight"] = layer.weight.detach()
        sd[f"features.{feat_i}.bias"] = layer.bias.detach()
    return sd


def _lpips_sd(twin):
    """Torch twin heads → lpips-package state_dict key names."""
    return {f"lin{i}.model.1.weight": lin.weight.detach()
            for i, lin in enumerate(twin.lins)}


@pytest.fixture(scope="module")
def twin():
    t = _TorchLPIPS().eval()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in t.parameters():
            p.copy_(torch.rand(p.shape, generator=g) * 0.1)
    return t


def test_lpips_golden_vs_torch(twin, tmp_path):
    from convert_lpips_weights import convert

    from vit_tpu.losses import lpips as lpips_mod

    npz = tmp_path / "lpips_random.npz"
    np.savez(npz, **convert(_alexnet_sd(twin), _lpips_sd(twin)))
    params = lpips_mod.load_params(str(npz))

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)

    with torch.no_grad():
        ref = twin(torch.from_numpy(x).permute(0, 3, 1, 2) * 2 - 1,
                   torch.from_numpy(y).permute(0, 3, 1, 2) * 2 - 1).numpy()

    fn = lpips_mod.lpips_fn(params)
    got = np.asarray(fn(jnp.asarray(x), jnp.asarray(y)))
    assert got.shape == (2,)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)

    # identical images → zero distance
    zero = np.asarray(fn(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(zero, 0.0, atol=1e-6)


def test_lpips_load_matches_init_structure(twin, tmp_path):
    from convert_lpips_weights import convert

    import jax

    from vit_tpu.losses import lpips as lpips_mod

    npz = tmp_path / "w.npz"
    np.savez(npz, **convert(_alexnet_sd(twin), _lpips_sd(twin)))
    loaded = lpips_mod.load_params(str(npz))

    ref = jax.eval_shape(lambda: lpips_mod.LPIPS().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64, 3))))["params"]
    flat_ref = {jax.tree_util.keystr(k): v.shape for k, v in
                jax.tree_util.tree_leaves_with_path(ref)}
    flat_got = {jax.tree_util.keystr(k): v.shape for k, v in
                jax.tree_util.tree_leaves_with_path(loaded)}
    assert flat_ref == flat_got
