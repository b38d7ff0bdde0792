"""Data-parallel serving exports (serve/export.py ``dp``): an artifact lowered
over a dp-device ("data",) mesh loads and executes across the 8-virtual-CPU
test mesh (tests/conftest.py), splitting each request's batch across devices —
the same fake-backend validation used for the training mesh (SURVEY.md §4).
The reference has no serving at all; multi-chip serving is a rebuild-original.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.models.titok import TiTok, TiTokConfig
from vit_tpu.serve.export import export_tokenizer, load_exported
from vit_tpu.train.checkpoint import Checkpointer
from vit_tpu.train.optim import make_optimizer
from vit_tpu.train.state import TrainState


def _save_titok(tmp_path, **cfg_kw):
    cfg = TiTokConfig(image_size=32, patch_size=8, latent_tokens=8,
                      codebook_size=64, latent_dim=4, transformer="S",
                      attn_impl="xla", **cfg_kw)
    model = TiTok(cfg)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    ckpt = Checkpointer(str(tmp_path / "ckpt"), mode="min")
    ckpt.save_if_best(TrainState.create(
        params, make_optimizer(1e-4, 1, 10, 1e-5, 0.0)), 1.0, config=cfg)
    ckpt.finalize()
    return model, params


def test_dp_export_matches_live_and_shards_batch(tmp_path):
    # fp32 end-to-end: dp resharding must not change the argmax, and pixels
    # should match the live model to fp32-reduction tolerance
    model, params = _save_titok(tmp_path, dtype=jnp.float32)
    images = jax.random.uniform(jax.random.PRNGKey(0), (8, 32, 32, 3),
                                jnp.float32)

    out = export_tokenizer(str(tmp_path / "ckpt"), str(tmp_path / "dp"),
                           bs=8, platforms=("cpu",), dp=4)
    served = load_exported(out)
    assert served["manifest"]["dp"] == 4

    idx = served["encode"](images)
    live_idx = model.apply({"params": params}, images, method=model.encode)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(live_idx))

    # the result really is laid out across the 4-device data mesh
    assert len(idx.sharding.device_set) == 4
    shard_rows = {s.index[0] for s in idx.addressable_shards}
    assert len(shard_rows) == 4  # batch axis split, not replicated

    img = served["decode"](np.asarray(idx))
    live_img = model.apply({"params": params}, live_idx,
                           method=model.decode_indices)
    np.testing.assert_allclose(np.asarray(img), np.asarray(live_img),
                               rtol=1e-4, atol=1e-5)


def test_dp_composes_with_int8_quantize(tmp_path):
    model, params = _save_titok(tmp_path)
    images = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3),
                                jnp.float32)
    out = export_tokenizer(str(tmp_path / "ckpt"), str(tmp_path / "q"),
                           bs=4, platforms=("cpu",), dp=2, quantize="int8")
    served = load_exported(out)
    man = served["manifest"]
    assert man["dp"] == 2 and man["quantize"] == "int8"
    idx = served["encode"](images)
    assert len(idx.sharding.device_set) == 2
    live_idx = model.apply({"params": params}, images, method=model.encode)
    assert float((np.asarray(idx) == np.asarray(live_idx)).mean()) > 0.5
    img = np.asarray(served["decode"](np.asarray(idx)))
    assert img.shape == (4, 32, 32, 3) and np.isfinite(img).all()


def test_dp_videogpt_rollout_with_seed(tmp_path):
    # the scalar seed input must replicate while the token batch shards
    from vit_tpu.models.videogpt import VideoGPT, VideoGPTConfig
    from vit_tpu.serve.export import export_videogpt

    cfg = VideoGPTConfig(frame_size=4, codebook_size=32, max_frames=4,
                         transformer="S", dropout=0.0, attn_impl="xla")
    model = VideoGPT(cfg)
    tokens = jnp.zeros((2, 2, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]
    ckpt = Checkpointer(str(tmp_path / "ckpt"), mode="min")
    ckpt.save_if_best(TrainState.create(
        params, make_optimizer(1e-4, 1, 10, 1e-5, 0.0)), 1.0, config=cfg)
    ckpt.finalize()

    out = export_videogpt(str(tmp_path / "ckpt"), str(tmp_path / "gen"),
                          cond_frames=2, gen_frames=2, bs=2,
                          platforms=("cpu",), temperature=1.0, dp=2)
    served = load_exported(out)
    roll = served["generate"](np.zeros((2, 8), np.int32), np.uint32(7))
    assert np.asarray(roll).shape == (2, 16)
    assert len(roll.sharding.device_set) == 2


def test_dp_rejects_indivisible_and_symbolic_batch(tmp_path):
    _save_titok(tmp_path)
    with pytest.raises(ValueError, match="not divisible"):
        export_tokenizer(str(tmp_path / "ckpt"), str(tmp_path / "x"),
                         bs=6, platforms=("cpu",), dp=4)
    with pytest.raises(ValueError, match="symbolic"):
        export_tokenizer(str(tmp_path / "ckpt"), str(tmp_path / "x"),
                         bs=0, platforms=("cpu",), dp=4)


def test_dp_export_needs_enough_devices(tmp_path):
    _save_titok(tmp_path)
    with pytest.raises(ValueError, match="visible devices"):
        export_tokenizer(str(tmp_path / "ckpt"), str(tmp_path / "x"),
                         bs=32, platforms=("cpu",), dp=16)


def test_dp_host_cpu_cli(tmp_path):
    # the CLI's --dp_host_cpu flag virtualizes dp CPU devices BEFORE backend
    # init (env var alone is too late; see scripts/export_tokenizer.py) — this
    # is how a single-chip host exports artifacts for a multi-chip serving
    # fleet. Subprocess: the script runs under the real sitecustomize, not
    # this suite's CPU-forcing conftest.
    import subprocess
    import sys
    from pathlib import Path

    model, params = _save_titok(tmp_path)
    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "scripts/export_tokenizer.py"),
         "--ckpt", str(tmp_path / "ckpt"), "--out", str(tmp_path / "cli"),
         "--bs", "4", "--dp", "2", "--dp_host_cpu", "--platforms", "cpu"],
        capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]

    served = load_exported(tmp_path / "cli")
    assert served["manifest"]["dp"] == 2
    images = np.random.default_rng(0).random((4, 32, 32, 3), np.float32)
    idx = served["encode"](images)
    assert len(idx.sharding.device_set) == 2
    live_idx = model.apply({"params": params}, jnp.asarray(images),
                           method=model.encode)
    assert float((np.asarray(idx) == np.asarray(live_idx)).mean()) > 0.5
