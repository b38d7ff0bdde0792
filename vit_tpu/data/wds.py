"""WebDataset-format tar shard IO (no webdataset dependency in this image).

Standard WebDataset layout: a tar archive whose member names are "<key>.<ext>";
consecutive members with the same key form one sample. Compatible with shards written
by the real webdataset library (the reference's convert2webdaset.py output).

Writer parity: wds.ShardWriter(pattern, maxcount) (reference convert2webdaset.py:38).
Handled extensions: jpg/jpeg/png (PIL-encoded images), cls (int), npy (arrays),
pth (torch tensors, read via torch-cpu), arbitrary bytes otherwise.
"""

from __future__ import annotations

import io
import json
import tarfile
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np


def _encode(ext: str, value) -> bytes:
    ext = ext.split(".")[-1]    # multi-part extensions like "sequence.npy"
    if ext in ("jpg", "jpeg", "png"):
        from PIL import Image

        if isinstance(value, Image.Image):
            img = value
        else:
            img = Image.fromarray(np.asarray(value))
        buf = io.BytesIO()
        img.save(buf, format="JPEG" if ext in ("jpg", "jpeg") else "PNG")
        return buf.getvalue()
    if ext == "cls":
        return str(int(value)).encode()
    if ext == "npy":
        buf = io.BytesIO()
        np.save(buf, np.asarray(value))
        return buf.getvalue()
    if ext == "pth":
        import torch

        buf = io.BytesIO()
        torch.save(value if isinstance(value, torch.Tensor)
                   else torch.from_numpy(np.asarray(value)), buf)
        return buf.getvalue()
    if ext == "json":
        return json.dumps(value).encode()
    if isinstance(value, bytes):
        return value
    raise ValueError(f"cannot encode extension {ext!r}")


def _decode(ext: str, data: bytes):
    ext = ext.split(".")[-1]    # multi-part extensions like "sequence.npy"
    if ext in ("jpg", "jpeg", "png"):
        from PIL import Image

        return Image.open(io.BytesIO(data)).convert("RGB")
    if ext == "cls":
        return int(data.decode())
    if ext == "npy":
        return np.load(io.BytesIO(data))
    if ext == "pth":
        import torch

        return torch.load(io.BytesIO(data), map_location="cpu",
                          weights_only=False).numpy()
    if ext == "json":
        return json.loads(data.decode())
    return data


class ShardWriter:
    """wds.ShardWriter equivalent: write({'__key__': k, 'jpg': img, 'cls': 3})."""

    def __init__(self, pattern: str, maxcount: int = 10000):
        self.pattern = pattern
        self.maxcount = maxcount
        self.shard_idx = 0
        self.count = 0
        self.total = 0
        self._tar: Optional[tarfile.TarFile] = None
        self.paths: List[str] = []

    def _open_next(self):
        self._close_current()
        path = self.pattern % self.shard_idx
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        self._tar = tarfile.open(path, "w")
        self.paths.append(path)
        self.shard_idx += 1
        self.count = 0

    def _close_current(self):
        if self._tar is not None:
            self._tar.close()
            self._tar = None

    def write(self, sample: Dict):
        if self._tar is None or self.count >= self.maxcount:
            self._open_next()
        key = sample["__key__"]
        for ext, value in sample.items():
            if ext == "__key__":
                continue
            data = _encode(ext, value)
            info = tarfile.TarInfo(f"{key}.{ext}")
            info.size = len(data)
            self._tar.addfile(info, io.BytesIO(data))
        self.count += 1
        self.total += 1

    def close(self):
        self._close_current()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def iterate_shard(path) -> Iterator[Dict]:
    """Yield decoded samples from one tar shard."""
    with tarfile.open(path, "r") as tar:
        current_key = None
        sample: Dict = {}
        for member in tar:
            if not member.isfile():
                continue
            # WebDataset convention: key = up to the FIRST dot of the basename,
            # extension = the (possibly multi-part) rest
            base = member.name
            key, ext = base.split(".", 1)
            if key != current_key:
                if sample:
                    yield sample
                current_key, sample = key, {"__key__": key}
            sample[ext] = _decode(ext, tar.extractfile(member).read())
        if sample:
            yield sample


class WebDataset:
    """Map-style dataset over a list of shards (indexes built lazily in memory)."""

    def __init__(self, shard_paths):
        self.samples: List = []
        for p in sorted(str(s) for s in shard_paths):
            for sample in iterate_shard(p):
                self.samples.append(sample)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict:
        return self.samples[idx]


class WdsImageClassification:
    """(image NHWC fp32 normalized, label) view over jpg+cls shards — the
    BASELINE.json configs[0] 'tiny webdataset shard' train_vit path."""

    def __init__(self, shard_paths, image_size: int, *, train: bool = True,
                 seed: int = 0):
        from vit_tpu.data.transforms import eval_transform, train_transform

        self._train_transform = train_transform
        self._eval_transform = eval_transform
        self.inner = WebDataset(shard_paths)
        self.image_size = image_size
        self.train = train
        self.seed = seed

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, idx: int):
        sample = self.inner[idx]
        img = sample["jpg"]
        if self.train:
            rng = np.random.default_rng((self.seed, idx))
            arr = self._train_transform(img, self.image_size, rng)
        else:
            arr = self._eval_transform(img, self.image_size)
        return arr.astype(np.float32), np.int32(sample.get("cls", 0))
