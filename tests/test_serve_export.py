"""Serving export round-trip: a trained-checkpoint tokenizer exported via
jax.export deserializes into standalone callables that match the live model."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.models.titok import TiTok, TiTokConfig
from vit_tpu.serve.export import export_tokenizer, load_exported
from vit_tpu.train.checkpoint import Checkpointer
from vit_tpu.train.optim import make_optimizer
from vit_tpu.train.state import TrainState


def _tiny_cfg():
    return TiTokConfig(image_size=32, patch_size=8, latent_tokens=8,
                       codebook_size=64, latent_dim=4, transformer="S",
                       attn_impl="xla")


def test_export_roundtrip_matches_live_model(tmp_path):
    cfg = _tiny_cfg()
    model = TiTok(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), images[:1])["params"]

    # save a real checkpoint (the export input is the Checkpointer layout)
    ckpt_dir = tmp_path / "ckpt"
    ckpt = Checkpointer(str(ckpt_dir), mode="min")
    state = TrainState.create(params, make_optimizer(1e-4, 1, 10, 1e-5, 0.0))
    ckpt.save_if_best(state, 1.0, config=cfg)
    ckpt.finalize()

    out = export_tokenizer(str(ckpt_dir), str(tmp_path / "export"), bs=2,
                           platforms=("cpu",))
    served = load_exported(out)
    assert served["manifest"]["image_size"] == 32
    assert served["manifest"]["n_tokens"] == 8

    live_idx = model.apply({"params": params}, images, method=model.encode)
    srv_idx = served["encode"](images)
    np.testing.assert_array_equal(np.asarray(live_idx), np.asarray(srv_idx))

    live_img = model.apply({"params": params}, live_idx,
                           method=model.decode_indices)
    srv_img = served["decode"](srv_idx)
    # the net computes in bf16 (TiTokConfig default); the serialized module and
    # the live jit compile to different fusion schedules, so decoded pixels
    # agree only to bf16 precision (indices above must still match exactly)
    np.testing.assert_allclose(np.asarray(live_img), np.asarray(srv_img),
                               rtol=0.05, atol=0.03)
