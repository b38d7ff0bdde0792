"""Device prefetch: overlap host→device batch transfer with device compute.

JAX transfers are asynchronous — ``jax.device_put`` (and ``jnp.asarray``)
returns immediately while the DMA proceeds in the background — but a training
loop that transfers its batch right before dispatching the step serializes
DMA → compute every iteration. On hosts with a slow device link this
dominates: the flagship TiTok-B step measures 0.245 s of device compute
(bench.py, on-device data) but 0.43-0.50 s through the train scripts — the
~0.2 s gap is the 12.6 MB batch crossing the link while the device idles.
(The reference's torch DataLoader has the same structure: host workers, no
device-side prefetch — /root/reference/datasets.py:26-27.)

``device_prefetch`` keeps ``depth`` prepared batches in flight: the transfer
for batch N+1 is issued before batch N is consumed, so the DMA rides under the
previous step's compute. depth=2 suffices (one in compute, one in flight); the
extra device memory is ``depth-1`` batches.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Iterable, Iterator


def device_prefetch(iterable: Iterable, prepare: Callable, depth: int = 2
                    ) -> Iterator:
    """Yield ``prepare(item)`` for each item, issuing ``prepare`` for up to
    ``depth`` items ahead of consumption. ``prepare`` should end in an async
    device transfer (jnp.asarray / jax.device_put / runner.put_batch)."""
    if depth < 1:
        raise ValueError("depth must be >= 1")
    queue: deque = deque()
    it = iter(iterable)

    def enqueue(n: int):
        for _ in range(n):
            try:
                item = next(it)
            except StopIteration:
                return
            queue.append(prepare(item))

    enqueue(depth)
    while queue:
        out = queue.popleft()
        enqueue(1)
        yield out
