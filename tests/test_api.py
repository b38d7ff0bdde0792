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


def _ssim_oracle(a, b, window_size=11, sigma=1.5, max_val=1.0):
    """Independent numpy SSIM (Wang et al. 2004): explicit per-window loops."""
    x = np.arange(window_size) - (window_size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    w = np.outer(g, g)
    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    B, H, W, C = a.shape
    out = np.zeros(B)
    for n in range(B):
        vals = []
        for c in range(C):
            for i in range(H - window_size + 1):
                for j in range(W - window_size + 1):
                    pa = a[n, i:i + window_size, j:j + window_size, c]
                    pb = b[n, i:i + window_size, j:j + window_size, c]
                    ma, mb = (w * pa).sum(), (w * pb).sum()
                    va = (w * pa * pa).sum() - ma * ma
                    vb = (w * pb * pb).sum() - mb * mb
                    cov = (w * pa * pb).sum() - ma * mb
                    vals.append(((2 * ma * mb + c1) * (2 * cov + c2)) /
                                ((ma ** 2 + mb ** 2 + c1) * (va + vb + c2)))
        out[n] = np.mean(vals)
    return out


def test_ssim_metric():
    from vit_tpu.utils.metrics import ssim

    rng = np.random.default_rng(0)
    a = rng.uniform(size=(2, 13, 13, 2)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape).astype(np.float32), 0, 1)
    got = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _ssim_oracle(a, b), atol=2e-5)
    # identical images -> 1
    np.testing.assert_allclose(np.asarray(ssim(jnp.asarray(a), jnp.asarray(a))),
                               1.0, atol=1e-5)
