"""Grain loader backend: stream parity with the threaded loader.

The Grain backend (vit_tpu/data/grain_loader.py) must be a drop-in for
loader.DataLoader — same batches with shuffle off, same shard partition
semantics, deterministic per-epoch reshuffle (reference equivalent: torch
DataLoader worker processes, datasets.py:26,119).
"""

import numpy as np
import pytest

from vit_tpu.data.grain_loader import (GrainDataLoader, grain_available,
                                       make_loader)
from vit_tpu.data.loader import DataLoader

pytestmark = pytest.mark.skipif(not grain_available(),
                                reason="grain not installed")


class RangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2, 2), i, np.float32), np.int32(i % 3)


def test_matches_threaded_loader_unshuffled():
    threaded = DataLoader(RangeDataset(12), 4, shuffle=False, num_workers=2)
    grain = GrainDataLoader(RangeDataset(12), 4, shuffle=False, num_workers=2)
    tb, gb = list(threaded), list(grain)
    assert len(tb) == len(gb) == len(grain) == 3
    for (tx, ty), (gx, gy) in zip(tb, gb):
        np.testing.assert_array_equal(tx, gx)
        np.testing.assert_array_equal(ty, gy)


def test_shuffle_is_deterministic_and_reshuffles_across_epochs():
    a = GrainDataLoader(RangeDataset(32), 4, shuffle=True, seed=7)
    b = GrainDataLoader(RangeDataset(32), 4, shuffle=True, seed=7)
    ea1, eb1 = list(a), list(b)
    for (ax, _), (bx, _) in zip(ea1, eb1):
        np.testing.assert_array_equal(ax, bx)  # same seed, same epoch → equal
    ea2 = list(a)
    flat1 = np.concatenate([x.ravel() for x, _ in ea1])
    flat2 = np.concatenate([x.ravel() for x, _ in ea2])
    assert sorted(flat1.tolist()) == sorted(flat2.tolist())  # same coverage
    assert not np.array_equal(flat1, flat2)  # but a different order


def test_sharding_partitions_records():
    seen = []
    for shard in range(2):
        loader = GrainDataLoader(RangeDataset(16), 2, shuffle=False,
                                 shard_id=shard, num_shards=2)
        for x, _ in loader:
            seen.extend(x[:, 0, 0].astype(int).tolist())
    assert sorted(seen) == list(range(16))  # disjoint and complete


def test_shuffled_shards_disjoint_complete_and_permuted():
    """With shuffle on, the fixed global permutation must keep shards disjoint
    and complete while breaking grain's contiguous-interval assignment."""
    seen, firsts = [], []
    for shard in range(2):
        loader = GrainDataLoader(RangeDataset(32), 4, shuffle=True, seed=3,
                                 shard_id=shard, num_shards=2)
        vals = []
        for x, _ in loader:
            vals.extend(x[:, 0, 0].astype(int).tolist())
        seen.extend(vals)
        firsts.append(sorted(vals))
    assert sorted(seen) == list(range(32))          # disjoint and complete
    assert firsts[0] != list(range(16))             # not the contiguous half


def test_drop_last_false_keeps_remainder():
    loader = GrainDataLoader(RangeDataset(10), 3, shuffle=False,
                             drop_last=False)
    batches = list(loader)
    assert sum(b[0].shape[0] for b in batches) == 10
    assert batches[-1][0].shape[0] == 1


def test_collate_handles_none_members():
    class WithNone(RangeDataset):
        def __getitem__(self, i):
            x, y = super().__getitem__(i)
            return x, None

    loader = GrainDataLoader(WithNone(6), 3, shuffle=False)
    x, none = next(iter(loader))
    assert x.shape == (3, 2, 2) and none is None


def test_factory_selects_backend():
    assert isinstance(make_loader(RangeDataset(4), 2), DataLoader)
    assert isinstance(make_loader(RangeDataset(4), 2, backend="grain"),
                      GrainDataLoader)
    with pytest.raises(ValueError):
        make_loader(RangeDataset(4), 2, backend="nope")
