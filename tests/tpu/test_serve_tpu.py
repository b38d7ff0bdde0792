"""Real-chip serving-path test: a tokenizer exported with a TPU lowering,
deserialized and called on the chip, matches the live model. Complements the
CPU round-trips in tests/test_serve_export.py — this is the deploy artifact
actually executing on TPU hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="real TPU only")


def test_export_tokenizer_runs_on_tpu(tmp_path):
    from vit_tpu.models.titok import TiTok, TiTokConfig
    from vit_tpu.serve.export import export_tokenizer, load_exported
    from vit_tpu.train.checkpoint import Checkpointer
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState

    cfg = TiTokConfig(image_size=32, patch_size=8, latent_tokens=8,
                      codebook_size=64, latent_dim=4, transformer="S",
                      dtype=jnp.float32)  # fp32: bit-stable argmax across jits
    model = TiTok(cfg)
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3),
                                jnp.float32)
    params = model.init(jax.random.PRNGKey(1), images[:1])["params"]
    ckpt = Checkpointer(str(tmp_path / "ckpt"), mode="min")
    ckpt.save_if_best(TrainState.create(
        params, make_optimizer(1e-4, 1, 10, 1e-5, 0.0)), 1.0, config=cfg)
    ckpt.finalize()

    out = export_tokenizer(str(tmp_path / "ckpt"), str(tmp_path / "export"),
                           bs=2, platforms=("tpu",))
    served = load_exported(out)

    live_idx = np.asarray(model.apply({"params": params}, images,
                                      method=model.encode))
    np.testing.assert_array_equal(np.asarray(served["encode"](images)),
                                  live_idx)
    live_img = model.apply({"params": params}, jnp.asarray(live_idx),
                           method=model.decode_indices)
    # fp32 matmuls on TPU run at default (bf16-pass) precision, and the live
    # apply and the deserialized artifact are compiled independently, so their
    # fusions differ: measured max-abs divergence 2.6e-3 on O(1) outputs.
    # Indices above are still exact; pixels get a TPU-precision tolerance.
    np.testing.assert_allclose(np.asarray(served["decode"](live_idx)),
                               np.asarray(live_img), rtol=1e-2, atol=5e-3)
