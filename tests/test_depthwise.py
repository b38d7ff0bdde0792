"""Pallas depthwise conv vs lax.conv_general_dilated oracle (values + grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.kernels.depthwise import depthwise_conv


def _oracle(x, w, b, ksize=7):
    c = x.shape[-1]
    k = w.reshape(ksize, ksize, 1, c)
    p = ksize // 2
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return out + b


@pytest.mark.parametrize("shape,ksize", [((2, 12, 16, 8), 7), ((3, 9, 9, 16), 3)])
def test_forward_matches_lax(shape, ksize):
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, shape, jnp.float32)
    w = jax.random.normal(kw, (ksize, ksize, shape[-1]), jnp.float32)
    b = jax.random.normal(kb, (shape[-1],), jnp.float32)
    got = depthwise_conv(x, w, b, ksize)
    want = _oracle(x, w, b, ksize)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4,
                               rtol=1e-4)


def test_grads_match_lax():
    kx, kw, kb, kg = jax.random.split(jax.random.PRNGKey(1), 4)
    shape = (2, 8, 10, 8)
    x = jax.random.normal(kx, shape, jnp.float32)
    w = jax.random.normal(kw, (7, 7, 8), jnp.float32)
    b = jax.random.normal(kb, (8,), jnp.float32)
    g = jax.random.normal(kg, shape, jnp.float32)

    _, vjp1 = jax.vjp(lambda x, w, b: depthwise_conv(x, w, b, 7), x, w, b)
    _, vjp2 = jax.vjp(lambda x, w, b: _oracle(x, w, b, 7), x, w, b)
    for a, bb in zip(vjp1(g), vjp2(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-3,
                                   rtol=1e-3)
