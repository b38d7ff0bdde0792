"""Structured synthetic dataset: random colored rectangles on gradient backgrounds.

Unlike gaussian noise (unlearnable), these images have learnable structure — used by
the integration demo (scripts/demo_pipeline.py) to show tokenizer reconstructions
actually converge and the frozen-tokenizer → VideoGPT composition works end-to-end.
"""

from __future__ import annotations

import numpy as np


def _draw_sample(rng: np.random.Generator, size: int) -> np.ndarray:
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    bg = np.stack([yy * rng.random(), xx * rng.random(),
                   (1 - yy) * rng.random()], axis=-1)
    img = bg.copy()
    for _ in range(rng.integers(1, 4)):
        h0, w0 = rng.integers(0, size // 2, 2)
        h1 = h0 + rng.integers(size // 8, size // 2)
        w1 = w0 + rng.integers(size // 8, size // 2)
        img[h0:h1, w0:w1] = rng.random(3)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


class ShapesImageLoader:
    """(B, S, S, 3) float images of random rectangles; infinite variety per epoch."""

    def __init__(self, image_size: int, batch_size: int, *,
                 steps_per_epoch: int = 100, seed: int = 0):
        self.image_size = image_size
        self.batch_size = batch_size
        self.steps_per_epoch = steps_per_epoch
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        return self.steps_per_epoch

    def __iter__(self):
        rng = np.random.default_rng((self.seed, self._epoch))
        self._epoch += 1
        for _ in range(self.steps_per_epoch):
            batch = np.stack([_draw_sample(rng, self.image_size)
                              for _ in range(self.batch_size)])
            yield batch, None


class ShapesVideoLoader:
    """(B, T, S, S, 3) uint8 videos of a rectangle moving linearly — learnable
    dynamics for the VideoGPT integration demo."""

    def __init__(self, batch_size: int, *, frames: int = 16, image_size: int = 32,
                 steps_per_epoch: int = 50, seed: int = 0):
        self.batch_size = batch_size
        self.frames = frames
        self.image_size = image_size
        self.steps_per_epoch = steps_per_epoch
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        return self.steps_per_epoch

    def __iter__(self):
        rng = np.random.default_rng((self.seed, self._epoch))
        self._epoch += 1
        s = self.image_size
        for _ in range(self.steps_per_epoch):
            videos = np.zeros((self.batch_size, self.frames, s, s, 3), np.float32)
            for b in range(self.batch_size):
                color = rng.random(3)
                size = int(rng.integers(s // 8, s // 3))
                x0, y0 = rng.integers(0, s - size, 2).astype(np.float32)
                vx, vy = rng.uniform(-2, 2, 2)
                for t in range(self.frames):
                    xt = int(np.clip(x0 + vx * t, 0, s - size))
                    yt = int(np.clip(y0 + vy * t, 0, s - size))
                    videos[b, t, yt:yt + size, xt:xt + size] = color
            yield (videos * 255).astype(np.uint8), None
