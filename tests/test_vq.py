"""VQ: Pallas lookup vs XLA oracle vs torch.cdist golden; STE semantics; FSQ."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vit_tpu.kernels.vq import nearest_code, nearest_code_xla
from vit_tpu.quantize.vq import FSQ, Quantizer


def test_nearest_code_matches_torch_cdist():
    """Golden vs the reference lookup math (train_titok.py:51-53)."""
    rng = np.random.default_rng(0)
    z = rng.standard_normal((64, 12)).astype(np.float32)
    cb = rng.standard_normal((97, 12)).astype(np.float32)
    got = nearest_code_xla(jnp.asarray(z), jnp.asarray(cb), l2_normalize=True)
    zt = torch.nn.functional.normalize(torch.from_numpy(z), dim=-1)
    et = torch.nn.functional.normalize(torch.from_numpy(cb), dim=-1)
    want = torch.cdist(zt, et).argmin(dim=-1).numpy()
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("l2", [True, False])
@pytest.mark.parametrize("shape", [(33, 12), (128, 8)])
def test_pallas_matches_xla_oracle(l2, shape):
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal((130, shape[1])).astype(np.float32))
    got = nearest_code(z, cb, l2_normalize=l2, impl="pallas")
    want = nearest_code_xla(z, cb, l2_normalize=l2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantizer_semantics():
    """Reference Quantizer semantics (train_titok.py:45-59): unnormalized lookup,
    codebook+β·commitment loss, straight-through gradient."""
    q = Quantizer(codebook_size=16, latent_dim=4, vq_impl="xla")
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4))
    params = q.init(jax.random.PRNGKey(1), z)["params"]
    quantized, indices, loss = q.apply({"params": params}, z)

    cb = np.asarray(params["codebook"])
    zn = np.asarray(z) / np.linalg.norm(np.asarray(z), axis=-1, keepdims=True)
    want_q = cb[np.asarray(indices)]
    # STE: forward value equals the raw codebook vector
    np.testing.assert_allclose(np.asarray(quantized), want_q, atol=1e-6)
    want_loss = ((want_q - zn) ** 2).mean() + 0.25 * ((want_q - zn) ** 2).mean()
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-5)

    # gradient flows to z through the STE (as if quantized == normalize(z))
    def f(z_):
        out, _, _ = q.apply({"params": params}, z_)
        return jnp.sum(out * 3.0)

    g = jax.grad(f)(z)

    def f_ref(z_):
        zn_ = z_ / jnp.maximum(jnp.linalg.norm(z_, axis=-1, keepdims=True), 1e-12)
        return jnp.sum(zn_ * 3.0)

    g_ref = jax.grad(f_ref)(z)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)

    # codebook gradient comes only from the codebook loss
    def f_cb(p):
        _, _, l = q.apply({"params": p}, z)
        return l

    g_cb = jax.grad(f_cb)(params)["codebook"]
    assert np.any(np.asarray(g_cb) != 0)


def test_quantizer_lookup_roundtrip():
    q = Quantizer(codebook_size=16, latent_dim=4, vq_impl="xla")
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4))
    params = q.init(jax.random.PRNGKey(1), z)["params"]
    _, indices, _ = q.apply({"params": params}, z)
    vecs = q.apply({"params": params}, indices, method="lookup")
    np.testing.assert_allclose(np.asarray(vecs),
                               np.asarray(params["codebook"])[np.asarray(indices)])


def test_fsq():
    fsq = FSQ(levels=(8, 5, 5, 5))
    z = jax.random.normal(jax.random.PRNGKey(0), (3, 7, 4)) * 2
    params = fsq.init(jax.random.PRNGKey(1), z)
    quantized, indices, loss = fsq.apply(params, z)
    assert float(loss) == 0.0
    assert np.asarray(indices).max() < 8 * 5 * 5 * 5
    assert np.abs(np.asarray(quantized)).max() <= 1.0 + 1e-6
    g = jax.grad(lambda z_: jnp.sum(fsq.apply(params, z_)[0]))(z)
    assert np.any(np.asarray(g) != 0)
