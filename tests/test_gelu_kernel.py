"""Fused bias+GELU kernel: parity with jnp for forward and BOTH gradients
(dz and the VMEM-emitted bias gradient), odd row counts, and pjit batch
sharding (vit_tpu/kernels/gelu.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.kernels.gelu import _bias_gelu, bias_gelu

TOL = 2e-5


def _ref(z, b):
    return jax.nn.gelu(z + b, approximate=False)


@pytest.mark.parametrize("n,f", [(40, 256), (300, 384), (513, 128)])
def test_forward_and_grads_match_jnp(n, f):
    z = jax.random.normal(jax.random.PRNGKey(0), (2, n, f))
    b = jax.random.normal(jax.random.PRNGKey(1), (f,)) * 0.2

    np.testing.assert_allclose(np.asarray(_bias_gelu(z, b)),
                               np.asarray(_ref(z, b)), atol=TOL, rtol=TOL)

    gz1, gb1 = jax.grad(lambda zz, bb: jnp.sum(_bias_gelu(zz, bb) ** 2),
                        argnums=(0, 1))(z, b)
    gz2, gb2 = jax.grad(lambda zz, bb: jnp.sum(_ref(zz, bb) ** 2),
                        argnums=(0, 1))(z, b)
    np.testing.assert_allclose(np.asarray(gz1), np.asarray(gz2),
                               atol=TOL, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2),
                               atol=1e-4, rtol=1e-4)


def test_dispatch_platforms():
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 128))
    b = jnp.zeros((128,))
    out_auto = bias_gelu(z, b)                  # xla on the CPU test platform
    out_forced = bias_gelu(z, b, impl="xla")
    np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_forced),
                               atol=TOL, rtol=TOL)


def test_pjit_batch_sharded_bias_grad():
    """db must be psum'd across batch shards (custom_partitioning lowering)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("data",))
    z = jax.random.normal(jax.random.PRNGKey(3), (8, 24, 128))
    b = jax.random.normal(jax.random.PRNGKey(4), (128,)) * 0.1

    def loss(zz, bb):
        return jnp.sum(_bias_gelu(zz, bb) ** 2)

    with mesh:
        zsh = jax.device_put(z, NamedSharding(mesh, P("data")))
        bsh = jax.device_put(b, NamedSharding(mesh, P()))
        gb = jax.jit(jax.grad(loss, argnums=1))(zsh, bsh)
    gb_ref = jax.grad(loss, argnums=1)(z, b)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref),
                               atol=1e-4, rtol=1e-4)
