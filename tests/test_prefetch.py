"""device_prefetch: ordering, look-ahead depth, and laziness."""

import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.data.prefetch import device_prefetch


def test_order_and_values():
    batches = [np.full((2, 2), i) for i in range(7)]
    out = list(device_prefetch(batches, jnp.asarray, depth=2))
    assert len(out) == 7
    for i, o in enumerate(out):
        np.testing.assert_array_equal(np.asarray(o), batches[i])


def test_lookahead_depth():
    prepared = []

    def prepare(i):
        prepared.append(i)
        return i

    gen = device_prefetch(range(5), prepare, depth=3)
    assert prepared == []          # nothing before first pull
    first = next(gen)
    assert first == 0
    # after yielding item 0 the queue holds depth items ahead (1, 2, 3)
    assert prepared == [0, 1, 2, 3]
    assert list(gen) == [1, 2, 3, 4]
    assert prepared == [0, 1, 2, 3, 4]


def test_short_iterable_and_empty():
    assert list(device_prefetch([1], lambda x: x + 1, depth=4)) == [2]
    assert list(device_prefetch([], lambda x: x, depth=2)) == []


def test_depth_validation():
    with pytest.raises(ValueError):
        list(device_prefetch([1], lambda x: x, depth=0))


def test_tuple_batches_like_train_loop():
    batches = [(np.ones((2, 4, 4, 3)) * i, np.array([i, i])) for i in range(3)]
    out = list(device_prefetch(batches,
                               lambda b: (jnp.asarray(b[0]), b[1])))
    for i, (img, lbl) in enumerate(out):
        assert float(img[0, 0, 0, 0]) == i
        assert lbl[0] == i
