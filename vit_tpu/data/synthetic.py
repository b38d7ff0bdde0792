"""Synthetic data loaders for smoke tests and benchmarks.

The reference has no synthetic path (its smoke checks were commented-out random-tensor
blocks, e.g. train_llamagen_titok.py:175-185); the rebuild makes it a first-class
dataset option so every entry point is runnable on CPU without datasets
(BASELINE.json configs[0] requires a CPU-runnable train_vit).
"""

from __future__ import annotations

import numpy as np


class SyntheticImageLoader:
    """Yields (images NHWC float32, int labels) batches, deterministic per epoch.

    mode="noise": i.i.d. standard-normal pixels — fine for throughput smoke and
    classifier plumbing, but information-theoretically INCOMPRESSIBLE, so any
    tokenizer trained on it plateaus at MSE ≈ pixel variance (≈1.0) by
    construction. mode="shapes": low-entropy random-rectangle images in [0,1]
    (vit_tpu/data/shapes_demo.py) where reconstruction loss genuinely descends —
    use this to validate tokenizer training end-to-end."""

    def __init__(self, image_size: int, batch_size: int, *, num_classes: int = 1000,
                 in_channels: int = 3, steps_per_epoch: int = 50, seed: int = 0,
                 mode: str = "noise"):
        self.image_size = image_size
        self.batch_size = batch_size
        self.num_classes = num_classes
        self.in_channels = in_channels
        self.steps_per_epoch = steps_per_epoch
        self.seed = seed
        self.mode = mode
        self._epoch = 0

    def __len__(self):
        return self.steps_per_epoch

    def __iter__(self):
        rng = np.random.default_rng((self.seed, self._epoch))
        self._epoch += 1
        if self.mode == "shapes":
            from vit_tpu.data.shapes_demo import _draw_sample

            for _ in range(self.steps_per_epoch):
                images = np.stack([_draw_sample(rng, self.image_size)
                                   for _ in range(self.batch_size)])
                labels = rng.integers(0, self.num_classes, self.batch_size,
                                      dtype=np.int32)
                yield images.astype(np.float32), labels
            return
        for _ in range(self.steps_per_epoch):
            images = rng.standard_normal(
                (self.batch_size, self.image_size, self.image_size,
                 self.in_channels), dtype=np.float32)
            labels = rng.integers(0, self.num_classes, self.batch_size,
                                  dtype=np.int32)
            yield images, labels


class SyntheticVideoLoader:
    """Yields (videos (B,T,H,W,C) uint8, dummy actions) batches — shape-compatible
    with the DMLab video loader (reference datasets.py:128-131)."""

    def __init__(self, batch_size: int, *, frames: int = 32, image_size: int = 64,
                 steps_per_epoch: int = 10, seed: int = 0):
        self.batch_size = batch_size
        self.frames = frames
        self.image_size = image_size
        self.steps_per_epoch = steps_per_epoch
        self.seed = seed

    def __len__(self):
        return self.steps_per_epoch

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        for _ in range(self.steps_per_epoch):
            videos = rng.integers(
                0, 256,
                (self.batch_size, self.frames, self.image_size, self.image_size, 3),
                dtype=np.uint8)
            actions = np.zeros((self.batch_size, self.frames), np.int32)
            yield videos, actions
