"""Compiled (real-TPU) parity for the fused dW+db linear backward at
production shapes (kernels/fc_grad.py). CPU interpret-mode parity lives in
tests/test_fc_grad.py; this file proves the Mosaic lowering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.kernels.fc_grad import fused_dense, matmul_dw_db

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="real TPU only")

N, C = 8 * 320, 768  # flagship token count at bs=8, TiTok-B width


@pytest.mark.parametrize("db_operand", [0, 1])
def test_matmul_dw_db_compiled(db_operand):
    key = jax.random.PRNGKey(0)
    ka, kb = jax.random.split(key)
    a = (jax.random.normal(ka, (N, C), jnp.float32) * 0.1).astype(jnp.bfloat16)
    b = (jax.random.normal(kb, (N, 4 * C), jnp.float32) * 0.1).astype(
        jnp.bfloat16)
    dw, db = jax.jit(lambda a, b: matmul_dw_db(a, b, db_operand=db_operand))(
        a, b)
    a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
    ref_dw = np.asarray(jnp.dot(a32.T, b32))
    ref_db = np.asarray((a32 if db_operand == 0 else b32).sum(0))
    np.testing.assert_allclose(np.asarray(dw), ref_dw, rtol=2e-2, atol=2e-1)
    np.testing.assert_allclose(np.asarray(db), ref_db, rtol=2e-2, atol=2e-1)


def test_fused_dense_grads_compiled():
    key = jax.random.PRNGKey(1)
    kx, kw = jax.random.split(key)
    x = (jax.random.normal(kx, (8, 320, C), jnp.float32) * 0.1).astype(
        jnp.bfloat16)
    w = (jax.random.normal(kw, (C, 4 * C), jnp.float32) * 0.02).astype(
        jnp.bfloat16)
    b = jnp.zeros((4 * C,), jnp.bfloat16)

    def loss_fused(w, b, x):
        return jnp.sum(fused_dense(x, w, b).astype(jnp.float32) ** 2)

    def loss_ref(w, b, x):
        return jnp.sum((jnp.dot(x, w) + b).astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(w, b, x)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(w, b, x)
    for got, ref, name in zip(gf, gr, ("dW", "db")):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=5e-2, atol=5e-1, err_msg=name)
