"""Public API surface: lazy exports resolve and compose."""

import jax
import jax.numpy as jnp
import numpy as np


def test_lazy_exports_resolve():
    import vit_tpu

    for name in vit_tpu.__dir__():
        assert getattr(vit_tpu, name) is not None


def test_api_end_to_end_compose():
    """The README-advertised usage: build, train-step, checkpoint via top-level API."""
    import vit_tpu

    cfg = vit_tpu.TiTokConfig(16, 4, 8, 32, 6, "S", dtype=jnp.float32,
                              attn_impl="xla")
    for name in ("enc_vit_config", "dec_vit_config"):
        sub = getattr(cfg, name)
        sub.trans_config = sub.trans_config.replace(n_layers=1, n_heads=2, n_embd=32)
    model = vit_tpu.TiTok(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    tx = vit_tpu.make_optimizer(1e-3, 1, 10, 1e-4, 1e-4)
    state = vit_tpu.TrainState.create(params, tx)
    recon, indices, loss = model.apply({"params": state.params}, x)
    assert recon.shape == x.shape
    mesh = vit_tpu.make_mesh(dp=len(jax.devices()))
    assert mesh.shape["data"] == len(jax.devices())


def test_psnr_metric():
    from vit_tpu.utils.metrics import psnr

    a = jnp.zeros((2, 8, 8, 3))
    assert np.isposinf(np.asarray(psnr(a, a))).all() or \
        (np.asarray(psnr(a, a)) > 100).all()
    b = jnp.ones((2, 8, 8, 3)) * 0.1
    # atol covers TPU transcendental precision: log10 on-chip gives 19.999851.
    np.testing.assert_allclose(np.asarray(psnr(a, b)), 20.0, atol=5e-4)
