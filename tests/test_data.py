"""Data layer: loader, transforms parity vs torchvision math, video datasets,
webdataset shard roundtrip, converter CLI."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from vit_tpu.data.loader import DataLoader
from vit_tpu.data.transforms import (center_crop, eval_transform, normalize,
                                     resize_shorter)
from vit_tpu.data.wds import ShardWriter, WebDataset, WdsImageClassification


class RangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2, 2), i, np.float32), np.int32(i % 3)


def test_loader_batches_and_drop_last():
    loader = DataLoader(RangeDataset(10), 3, shuffle=False, drop_last=True,
                        num_workers=2)
    batches = list(loader)
    assert len(batches) == 3 == len(loader)
    x, y = batches[0]
    assert x.shape == (3, 2, 2) and y.shape == (3,)
    # no drop_last keeps the remainder
    loader2 = DataLoader(RangeDataset(10), 3, shuffle=False, drop_last=False)
    assert sum(b[0].shape[0] for b in loader2) == 10


def test_loader_shuffles_and_shards():
    loader = DataLoader(RangeDataset(16), 4, shuffle=True, seed=1)
    seen = np.concatenate([b[0][:, 0, 0] for b in loader])
    assert not np.array_equal(seen, np.arange(16))
    assert sorted(seen.tolist()) == list(range(16))
    a = DataLoader(RangeDataset(16), 2, shuffle=False, shard_id=0, num_shards=2)
    b = DataLoader(RangeDataset(16), 2, shuffle=False, shard_id=1, num_shards=2)
    sa = {int(v) for batch in a for v in batch[0][:, 0, 0]}
    sb = {int(v) for batch in b for v in batch[0][:, 0, 0]}
    assert sa.isdisjoint(sb) and len(sa | sb) == 16


def test_eval_transform_matches_torchvision_math():
    """Resize(shorter)+CenterCrop+Normalize ≡ the reference pipeline
    (datasets.py:16-21)."""
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (37, 53, 3), np.uint8)
    img = Image.fromarray(arr)
    got = eval_transform(img, 16)
    assert got.shape == (16, 16, 3)
    # independent recomputation
    w, h = img.size
    scale = 16 / min(w, h)
    ref_img = img.resize((round(w * scale), 16), Image.BILINEAR)
    ref = center_crop(np.asarray(ref_img), 16).astype(np.float32) / 255.0
    np.testing.assert_allclose(got, normalize(ref), atol=1e-6)


def _write_fake_dmlab(root: Path, n_videos=3, frames=12, size=8):
    rng = np.random.default_rng(0)
    (root / "ep0").mkdir(parents=True)
    for i in range(n_videos):
        np.savez(root / "ep0" / f"v{i}.npz",
                 video=rng.integers(0, 255, (frames, size, size, 3), np.uint8),
                 actions=np.zeros(frames, np.int64))


def test_dmlab_image_and_video_loaders(tmp_path):
    from vit_tpu.data.video import get_dmlab_image_loaders, get_dmlab_video_loaders

    _write_fake_dmlab(tmp_path)
    img_loader, _ = get_dmlab_image_loaders(16, dataset_path=str(tmp_path))
    x, y = next(iter(img_loader))
    assert x.shape == (16, 8, 8, 3)       # (bs//8 videos)×8 frames flattened
    assert x.dtype == np.float32 and 0.0 <= x.min() and x.max() <= 1.0

    vid_loader, _ = get_dmlab_video_loaders(2, dataset_path=str(tmp_path))
    v, a = next(iter(vid_loader))
    assert v.shape == (2, 12, 8, 8, 3) and v.dtype == np.uint8


def test_minecraft_dataset_cv2(tmp_path):
    import cv2

    from vit_tpu.data.video import MinecraftDataset

    (tmp_path / "ep0").mkdir()
    writer = cv2.VideoWriter(str(tmp_path / "ep0" / "v0.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 10, (16, 16))
    for i in range(6):
        writer.write(np.full((16, 16, 3), i * 30, np.uint8))
    writer.release()
    ds = MinecraftDataset(str(tmp_path))
    video, actions = ds[0]
    assert video.shape == (6, 16, 16, 3)
    assert actions.shape == (6,)


def test_shard_writer_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pattern = str(tmp_path / "test-%06d.tar")
    with ShardWriter(pattern, maxcount=3) as writer:
        for i in range(7):
            writer.write({"__key__": f"{i:04d}",
                          "jpg": rng.integers(0, 255, (8, 8, 3), np.uint8),
                          "cls": i % 2,
                          "npy": np.arange(4) + i})
    assert writer.shard_idx == 3  # 3+3+1
    ds = WebDataset(writer.paths)
    assert len(ds) == 7
    s = ds[5]
    assert s["cls"] == 1
    np.testing.assert_array_equal(s["npy"], np.arange(4) + 5)
    assert np.asarray(s["jpg"]).shape == (8, 8, 3)

    clf = WdsImageClassification(writer.paths, image_size=8, train=False)
    x, y = clf[0]
    assert x.shape == (8, 8, 3) and x.dtype == np.float32


def test_converter_cli_video_mode(tmp_path):
    _write_fake_dmlab(tmp_path / "src")
    out = tmp_path / "out"
    res = subprocess.run(
        [sys.executable, "convert2webdataset.py", "--dataset", "dmlab",
         "--mode", "video", "--data_dir", str(tmp_path / "src"),
         "--output_dir", str(out), "--stack_frames", "4", "--keep_every", "2"],
        capture_output=True, text=True, cwd=Path(__file__).parent.parent)
    assert res.returncode == 0, res.stderr
    shards = sorted(out.glob("dmlab-train-*.tar"))
    assert shards
    ds = WebDataset(shards)
    clip = ds[0]["sequence.npy"]
    assert clip.shape == (4, 8, 8, 3)  # stack_frames frames after striding


def _write_shards(tmp_path, n=25, maxcount=5, size=16):
    from PIL import Image

    rng = np.random.default_rng(0)
    pattern = str(tmp_path / "shard-%04d.tar")
    with ShardWriter(pattern, maxcount=maxcount) as w:
        for i in range(n):
            img = Image.fromarray(
                rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
            w.write({"__key__": f"{i:06d}", "jpg": img, "cls": i % 4})
        paths = list(w.paths)
    return paths


def test_streaming_wds_yields_each_sample_once_and_reshuffles(tmp_path):
    from vit_tpu.data.wds import StreamingWebDataset

    paths = _write_shards(tmp_path)
    ds = StreamingWebDataset(paths, shuffle_buffer=8, seed=3, workers=2,
                             transform=lambda s: s["__key__"])
    epoch1 = list(ds)
    epoch2 = list(ds)
    assert sorted(epoch1) == [f"{i:06d}" for i in range(25)]
    assert sorted(epoch2) == sorted(epoch1)
    assert epoch1 != epoch2  # reshuffled across epochs


def test_streaming_wds_shards_are_disjoint(tmp_path):
    from vit_tpu.data.wds import StreamingWebDataset

    paths = _write_shards(tmp_path)  # 5 shards x 5 samples
    got = []
    for sid in range(2):
        ds = StreamingWebDataset(paths, shuffle_buffer=0, workers=1,
                                 shard_id=sid, num_shards=2,
                                 transform=lambda s: s["__key__"])
        assert len(ds.shard_paths) == 2  # equalized: 5//2 shards per host
        got.append(set(ds))
    assert got[0].isdisjoint(got[1])
    # the odd 5th shard is dropped so hosts see EQUAL per-epoch batch counts
    # (uneven counts deadlock collective global-batch assembly multihost)
    assert len(got[0]) == len(got[1]) == 10

    # fewer shards than hosts cannot be split collectively-safely
    import pytest

    with pytest.raises(ValueError, match="host"):
        StreamingWebDataset(paths[:1], shard_id=0, num_shards=2)


def test_streaming_image_loader_batches(tmp_path):
    from vit_tpu.data.wds import streaming_image_loader

    paths = _write_shards(tmp_path)
    loader = streaming_image_loader(paths, 16, 8, train=True, shuffle_buffer=4,
                                    workers=2)
    batches = list(loader)
    assert len(batches) == 3  # 25 // 8, drop_last
    images, labels = batches[0]
    assert images.shape == (8, 16, 16, 3) and images.dtype == np.float32
    assert labels.shape == (8,)
