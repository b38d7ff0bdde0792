"""Checkpointable input streams: resume the data pipeline, not just the weights.

The reference loses the run on crash and never reads its checkpoints back
(SURVEY.md §5); this rebuild already restores params/optimizer/step via orbax
(vit_tpu/train/checkpoint.py). What that alone cannot restore is the *input
stream position*: a resumed run would re-consume the dataset from the top, so
its batch sequence diverges from the uninterrupted run's.

Every loader in vit_tpu.data keys its shuffle off ``(seed, epoch)`` with the
epoch held in a ``_epoch`` attribute that increments per ``__iter__`` (e.g.
loader.py:60, synthetic.py:40, wds.py:184, grain_loader.py:78). The stream
position is therefore fully described by ``{"epoch": E, "next_batch": B}``:
set the epoch counter back to E and skip the first B batches of that epoch.
The train loops persist this dict next to every orbax checkpoint
(Checkpointer.save_data_state) and call the two helpers below on ``--resume``.

Semantics by loader:
  - map-style ``DataLoader``: EXACT and free — the skip slices the epoch's
    index permutation before any decode work is submitted (loader.py).
  - synthetic loaders: EXACT — regenerating the skipped batches costs host RNG
    draws only.
  - ``StreamingWebDataset`` (multi-threaded tar streaming): POSITIONAL — the
    worker-thread interleaving into the shuffle buffer is not deterministic
    across runs, so the resumed epoch re-streams and discards B batches; the
    epoch/step accounting and shard ordering are restored, the exact sample
    order within the epoch is not (it wasn't reproducible before the crash
    either). Grain with multiprocess workers is in the same class.
"""

from __future__ import annotations

from typing import Iterator

_SENTINEL = object()


def set_stream_epoch(loader, epoch: int) -> bool:
    """Rewind/forward a loader's internal epoch counter to ``epoch``.

    Walks the loader and its nested ``.dataset`` chain (StreamingBatcher wraps
    StreamingWebDataset; DataLoader wraps map datasets) setting every
    ``_epoch`` attribute found. Returns whether any was set."""
    seen = set()
    obj = loader
    found = False
    while obj is not None and id(obj) not in seen:
        seen.add(id(obj))
        if hasattr(obj, "_epoch"):
            obj._epoch = int(epoch)
            found = True
        obj = getattr(obj, "dataset", None)
    return found


def resume_stream(loader, skip: int) -> Iterator:
    """Iterate one epoch of ``loader``, skipping its first ``skip`` batches.

    Uses the loader's native fast path when it has one (DataLoader slices the
    epoch's index permutation — zero wasted decode); otherwise consumes and
    discards. ``skip >= len(epoch)`` yields an empty epoch (the caller's epoch
    loop then proceeds to the next epoch, which is exactly right for a
    checkpoint written at an epoch boundary)."""
    if skip <= 0:
        return iter(loader)
    if hasattr(loader, "_skip_next"):
        loader._skip_next = int(skip)
        return iter(loader)

    def gen():
        it = iter(loader)
        for _ in range(skip):
            if next(it, _SENTINEL) is _SENTINEL:
                return
        yield from it

    return gen()
