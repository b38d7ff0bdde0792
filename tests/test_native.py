"""Native C++ image pipeline: build, PIL-path parity, ImageNet loader integration."""

import io
import shutil

import numpy as np
import pytest
from PIL import Image

from vit_tpu.data import native

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None and not native.is_available(),
    reason="no g++ and no prebuilt native lib")


def _jpeg(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def test_native_builds_and_matches_pil_eval_path():
    from vit_tpu.data.transforms import eval_transform

    assert native.is_available()
    rng = np.random.default_rng(0)
    for shape in [(57, 83, 3), (120, 40, 3), (64, 64, 3)]:
        jpeg = _jpeg(rng.integers(0, 255, shape, np.uint8))
        got = native.decode_batch([jpeg], 32, train=False)[0]
        want = eval_transform(Image.open(io.BytesIO(jpeg)), 32)
        # tolerance: PIL uses fixed-point filter weights, native uses float —
        # differences stay within ~1 uint8 LSB (≈0.0175 in normalized units)
        assert np.abs(got - want).max() < 0.03, shape


def test_native_train_path_is_stochastic_and_in_range():
    rng = np.random.default_rng(1)
    jpeg = _jpeg(rng.integers(0, 255, (100, 90, 3), np.uint8))
    a = native.decode_batch([jpeg], 32, train=True, seed=1)[0]
    b = native.decode_batch([jpeg], 32, train=True, seed=2)[0]
    assert not np.allclose(a, b)          # different crop/flip
    assert np.isfinite(a).all()
    # deterministic for fixed seed
    a2 = native.decode_batch([jpeg], 32, train=True, seed=1)[0]
    np.testing.assert_array_equal(a, a2)


def test_native_imagenet_loader_integration(tmp_path):
    from vit_tpu.data.imagenet import get_imagenet_loaders

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for cls in ("cat", "dog"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(6):
                Image.fromarray(rng.integers(0, 255, (48, 56, 3), np.uint8)).save(
                    d / f"{i}.jpg", quality=92)
    train, valid = get_imagenet_loaders(32, 4, data_dir=str(tmp_path),
                                        num_workers=2, use_native="always")
    x, y = next(iter(train))
    assert x.shape == (4, 32, 32, 3) and x.dtype == np.float32
    assert set(np.asarray(y)) <= {0, 1}
    xv, yv = next(iter(valid))
    assert xv.shape[1:] == (32, 32, 3)
