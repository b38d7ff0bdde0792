"""Grain-backed data loader (drop-in alternative to vit_tpu.data.loader.DataLoader).

The reference feeds models with torch DataLoader worker processes
(reference datasets.py:26,119,125,130). The TPU-idiomatic host pipeline is Google
Grain: deterministic index sampling, per-host sharding, and checkpointable
iterators. This wraps ``grain.python.DataLoader`` behind the exact interface of
our threaded loader so every ``get_*_loaders`` builder (and train script) can
switch backends with ``backend="grain"`` and nothing downstream changes.

Why both backends exist: the threaded loader (loader.py) is dependency-free and
saturates host cores for GIL-releasing decode work (libjpeg/cv2); Grain adds
determinism-by-construction (sampler state is an index, not RNG side effects)
and multiprocess workers for decode paths that do NOT release the GIL. Parity is
pinned by tests/test_grain_loader.py (same dataset, same seed discipline, equal
batch streams with shuffle off, disjoint-and-complete shard coverage). Shard
ASSIGNMENT semantics differ deliberately — see _SourceAdapter.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from vit_tpu.data.loader import default_collate


def grain_available() -> bool:
    try:
        import grain.python  # noqa: F401
        return True
    except Exception:  # pragma: no cover - environment-dependent
        return False


class GrainDataLoader:
    """Map-style dataset -> shuffled, batched, prefetched iterator via Grain.

    Constructor surface matches loader.DataLoader. Each ``__iter__`` builds a
    fresh single-epoch ``IndexSampler`` seeded with ``seed + epoch`` so epochs
    reshuffle deterministically (mirroring the threaded loader's
    ``np.random.default_rng(seed + epoch)`` discipline).

    worker_count=0 runs reads in-process on ``num_workers`` reader threads
    (ReadOptions.num_threads) — right for GIL-releasing decoders and avoids
    multiprocess spawn in tests; pass ``processes > 0`` for true multiprocess
    workers on GIL-bound datasets.
    """

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 8,
                 prefetch: int = 2, collate_fn: Optional[Callable] = None,
                 seed: int = 0, shard_id: int = 0, num_shards: int = 1,
                 processes: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.collate_fn = collate_fn or default_collate
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.processes = processes
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        nb = n // self.batch_size
        if not self.drop_last and n % self.batch_size:
            nb += 1
        return nb

    def __iter__(self):
        import grain.python as gp

        epoch_seed = self.seed + self._epoch
        self._epoch += 1
        sampler = gp.IndexSampler(
            num_records=len(self.dataset),
            # drop_remainder=False: keep every record (unequal shards by ≤1),
            # matching the threaded loader's strided partition — batch-level
            # drop_last is handled in the batching loop below.
            shard_options=gp.ShardOptions(shard_index=self.shard_id,
                                          shard_count=self.num_shards,
                                          drop_remainder=False),
            shuffle=self.shuffle,
            num_epochs=1,
            seed=epoch_seed,
        )
        loader = gp.DataLoader(
            data_source=_SourceAdapter(self.dataset, self.seed
                                       if self.shuffle else None),
            sampler=sampler,
            operations=[],
            worker_count=self.processes,
            read_options=gp.ReadOptions(num_threads=self.num_workers,
                                        prefetch_buffer_size=max(
                                            self.prefetch * self.batch_size, 1)),
        )
        # Batch on our side with the caller's collate_fn: grain's Batch operation
        # tree-stacks, but several datasets return tuples with None members
        # (video datasets' dummy actions) that default_collate understands.
        buf = []
        for record in loader:
            buf.append(record)
            if len(buf) == self.batch_size:
                yield self.collate_fn(buf)
                buf = []
        if buf and not self.drop_last:
            yield self.collate_fn(buf)


class _SourceAdapter:
    """Adapt a map-style dataset to grain's RandomAccessDataSource protocol.

    ``perm_seed`` applies a FIXED seed-derived global permutation under grain's
    record keys. Grain's IndexSampler shards CONTIGUOUSLY before shuffling, so
    without this each host would own a fixed contiguous dataset interval —
    class-skewed for class-sorted layouts like ImageFolderDataset. With the
    permutation, shards are random (epoch-independent) subsets; within-shard
    order still reshuffles per epoch via the sampler seed. Remaining divergence
    from the threaded loader (which re-partitions globally every epoch): shard
    MEMBERSHIP is fixed across epochs — the standard fixed-shard-assignment
    discipline of production input pipelines."""

    def __init__(self, dataset, perm_seed=None):
        self._dataset = dataset
        self._perm = (np.random.default_rng(perm_seed).permutation(len(dataset))
                      if perm_seed is not None else None)

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, record_key) -> object:
        idx = int(record_key)
        if self._perm is not None:
            idx = int(self._perm[idx])
        return self._dataset[idx]

    def __repr__(self) -> str:  # pragma: no cover
        return f"_SourceAdapter({self._dataset!r})"


def make_loader(dataset, batch_size: int, *, backend: str = "threads", **kw):
    """Loader factory: backend="threads" (loader.DataLoader) or "grain"."""
    if backend == "grain":
        if not grain_available():
            raise RuntimeError("backend='grain' requested but grain is not "
                               "installed; use backend='threads'")
        return GrainDataLoader(dataset, batch_size, **kw)
    if backend != "threads":
        raise ValueError(f"unknown loader backend {backend!r}")
    from vit_tpu.data.loader import DataLoader
    kw.pop("processes", None)
    return DataLoader(dataset, batch_size, **kw)
