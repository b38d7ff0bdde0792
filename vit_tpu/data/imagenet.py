"""ImageNet-style folder loaders (reference datasets.py:7-28 get_imagenet_loaders).

Layout expected: <data_dir>/train/<class>/<img>.JPEG and <data_dir>/val/... (the
torchvision ImageNet on-disk layout the reference points at). Same loader shape as the
reference: shuffled drop_last train loader with 8 workers / prefetch 2, 2×-batch
sequential val loader.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np
from PIL import Image

from vit_tpu.data.loader import DataLoader
from vit_tpu.data.transforms import eval_transform, train_transform

_IMG_EXTS = {".jpeg", ".jpg", ".png", ".bmp", ".webp"}


class ImageFolderDataset:
    """<root>/<class>/<image> with labels from sorted class-dir names."""

    def __init__(self, root: str, image_size: int, *, train: bool, seed: int = 0):
        self.root = Path(root)
        if not self.root.is_dir():
            raise FileNotFoundError(
                f"ImageNet directory not found: {self.root}. Pass --data_dir (or use "
                f"--dataset synthetic for a smoke run).")
        self.image_size = image_size
        self.train = train
        self.seed = seed
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = []
        for c in classes:
            for f in sorted((self.root / c).iterdir()):
                if f.suffix.lower() in _IMG_EXTS:
                    self.samples.append((f, self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int):
        path, label = self.samples[idx]
        img = Image.open(path)
        if self.train:
            rng = np.random.default_rng((self.seed, idx, np.random.randint(1 << 31)))
            arr = train_transform(img, self.image_size, rng)
        else:
            arr = eval_transform(img, self.image_size)
        return arr.astype(np.float32), np.int32(label)


def get_imagenet_loaders(image_size: int, bs: int,
                         data_dir: Optional[str] = None,
                         num_workers: int = 8,
                         shard_id: int = 0, num_shards: int = 1
                         ) -> Tuple[DataLoader, DataLoader]:
    """Loader parity with reference datasets.py:7-28."""
    data_dir = data_dir or '/mnt/data/Public_datasets/imagenet/imagenet_pytorch'
    train_set = ImageFolderDataset(Path(data_dir) / "train", image_size, train=True)
    valid_set = ImageFolderDataset(Path(data_dir) / "val", image_size, train=False)
    train_loader = DataLoader(train_set, bs, shuffle=True, drop_last=True,
                              num_workers=num_workers, prefetch=2,
                              shard_id=shard_id, num_shards=num_shards)
    valid_loader = DataLoader(valid_set, 2 * bs, shuffle=False, drop_last=False,
                              num_workers=max(1, num_workers // 2),
                              shard_id=shard_id, num_shards=num_shards)
    return train_loader, valid_loader
