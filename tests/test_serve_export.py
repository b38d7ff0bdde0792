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


def test_export_classifier_infers_num_classes(tmp_path):
    from vit_tpu.models.vit import ViTClassifier, ViTConfig
    from vit_tpu.serve.export import export_classifier

    cfg = ViTConfig(image_size=32, in_channels=3, patch_size=8,
                    transformer="S", extra_tokens=1, dropout=0.0,
                    attn_impl="xla")
    model = ViTClassifier(cfg, num_classes=7)
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3),
                                jnp.float32)
    params = model.init(jax.random.PRNGKey(1), images[:1])["params"]

    ckpt_dir = tmp_path / "ckpt"
    ckpt = Checkpointer(str(ckpt_dir), mode="max")
    state = TrainState.create(params, make_optimizer(1e-4, 1, 10, 1e-5, 0.0))
    ckpt.save_if_best(state, 0.5, config=cfg)
    ckpt.finalize()

    # num_classes deliberately NOT passed: read off the head kernel metadata
    out = export_classifier(str(ckpt_dir), str(tmp_path / "export"), bs=2,
                            platforms=("cpu",))
    served = load_exported(out)
    assert served["manifest"]["num_classes"] == 7
    assert served["manifest"]["functions"] == ["predict"]

    live = model.apply({"params": params}, images, deterministic=True)
    np.testing.assert_allclose(np.asarray(live),
                               np.asarray(served["predict"](images)),
                               rtol=2e-2, atol=2e-2)


def test_http_server_roundtrip(tmp_path):
    """Export → make_server → npy-over-HTTP matches the live model, including
    the pad-to-exported-bs path for small batches."""
    import io
    import threading
    import urllib.request

    from vit_tpu.serve.server import make_server

    cfg = _tiny_cfg()
    model = TiTok(cfg)
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3),
                                jnp.float32)
    params = model.init(jax.random.PRNGKey(1), images[:1])["params"]
    ckpt_dir = tmp_path / "ckpt"
    ckpt = Checkpointer(str(ckpt_dir), mode="min")
    ckpt.save_if_best(TrainState.create(
        params, make_optimizer(1e-4, 1, 10, 1e-5, 0.0)), 1.0, config=cfg)
    ckpt.finalize()
    out = export_tokenizer(str(ckpt_dir), str(tmp_path / "export"), bs=2,
                           platforms=("cpu",))

    srv = make_server(str(out), port=0)  # port 0: OS-assigned free port
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        def post(path, arr):
            buf = io.BytesIO()
            np.save(buf, arr)
            req = urllib.request.Request(url + path, data=buf.getvalue(),
                                         method="POST")
            with urllib.request.urlopen(req) as resp:
                return np.load(io.BytesIO(resp.read()))

        with urllib.request.urlopen(url + "/manifest") as resp:
            import json

            assert json.load(resp)["n_tokens"] == 8

        live_idx = np.asarray(
            model.apply({"params": params}, images, method=model.encode))
        np.testing.assert_array_equal(post("/encode", np.asarray(images)),
                                      live_idx)
        # single example against a bs=2 artifact: server pads and re-slices
        np.testing.assert_array_equal(post("/encode", np.asarray(images[:1])),
                                      live_idx[:1])
        assert post("/decode", live_idx).shape == (2, 32, 32, 3)

        # oversized batch is a clean 400, not a silent truncation
        import urllib.error

        try:
            post("/encode", np.zeros((3, 32, 32, 3), np.float32))
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()


def _save_ckpt(tmp_path, params, cfg, mode="min"):
    ckpt_dir = tmp_path / "ckpt"
    ckpt = Checkpointer(str(ckpt_dir), mode=mode)
    ckpt.save_if_best(TrainState.create(
        params, make_optimizer(1e-4, 1, 10, 1e-5, 0.0)), 1.0, config=cfg)
    ckpt.finalize()
    return str(ckpt_dir)


def test_export_all_tokenizer_families(tmp_path):
    """enhancing / tatitok / llamagen_titok round-trip: exported encode
    indices match the live model exactly; decode executes with the manifest's
    declared shapes."""
    from vit_tpu.models.enhancing_vqgan import (EnhancingViTVQGAN,
                                                EnhancingVQGANConfig)
    from vit_tpu.models.llamagen_titok import (LlamaGenTiTok,
                                               LlamaGenTiTokConfig)
    from vit_tpu.models.tatitok import TATiTok, TATiTokConfig

    cases = [
        ("enhancing",
         EnhancingViTVQGAN(EnhancingVQGANConfig(
             image_size=32, patch_size=8, codebook_size=64, latent_dim=4,
             dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
             attn_impl="xla")),
         jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))),
        ("tatitok",
         TATiTok(TATiTokConfig(image_size=32, patch_size=8, latent_tokens=8,
                               codebook_size=64, latent_dim=4,
                               transformer="small", attn_impl="xla")),
         jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))),
        # fp32: under bf16, tiny-random codebooks produce cosine near-ties
        # that the export-compiled and live-jit executables (different XLA
        # fusion orders) break differently — observed 1/16 index flips with
        # top-2 score gap ~3e-3, right at bf16 latent resolution
        ("llamagen_titok",
         LlamaGenTiTok(LlamaGenTiTokConfig(
             vq_codebook_size=32, vq_latent_tokens=16, latent_tokens=8,
             codebook_size=64, latent_dim=4, transformer="S",
             dtype=jnp.float32, attn_impl="xla")),
         jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, 32)),
    ]
    # enhancing is per-patch: n_tokens = n_patches = (32/8)^2
    n_tokens = {"enhancing": 16, "tatitok": 8, "llamagen_titok": 8}
    for name, model, x in cases:
        params = model.init(jax.random.PRNGKey(1), x[:1])["params"]
        ckpt_dir = _save_ckpt(tmp_path / name, params, model.config)
        out = export_tokenizer(ckpt_dir, str(tmp_path / name / "export"),
                               model=name, bs=2, platforms=("cpu",))
        served = load_exported(out)
        assert served["manifest"]["model"] == name
        assert served["manifest"]["n_tokens"] == n_tokens[name]

        if name == "tatitok":
            live_idx = model.apply({"params": params}, x,
                                   method=model.encode)[1][
                                       "min_encoding_indices"]
        else:
            live_idx = model.apply({"params": params}, x, method=model.encode)
        np.testing.assert_array_equal(np.asarray(live_idx),
                                      np.asarray(served["encode"](x)),
                                      err_msg=name)
        decoded = served["decode"](np.asarray(live_idx))
        if name == "llamagen_titok":
            assert decoded.shape == (2, 16, 32)  # logits over the VQ codebook
        else:
            assert decoded.shape == (2, 32, 32, 3)


def test_export_symbolic_batch(tmp_path):
    """bs=0 exports a symbolic batch dim: the same artifact serves any
    request size, matching the live model exactly (fp32)."""
    cfg = _tiny_cfg()
    cfg.dtype = jnp.float32  # exact across compilations (no bf16 VQ ties)
    cfg.__post_init__()
    model = TiTok(cfg)
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3),
                                jnp.float32)
    params = model.init(jax.random.PRNGKey(1), images[:1])["params"]
    ckpt_dir = _save_ckpt(tmp_path, params, cfg)
    out = export_tokenizer(ckpt_dir, str(tmp_path / "export"), bs=0,
                           platforms=("cpu",))
    served = load_exported(out)
    assert served["manifest"]["bs"] == 0
    for k in (1, 3, 5):
        x = jax.random.uniform(jax.random.PRNGKey(k), (k, 32, 32, 3))
        live = model.apply({"params": params}, x, method=model.encode)
        np.testing.assert_array_equal(np.asarray(served["encode"](x)),
                                      np.asarray(live), err_msg=str(k))
        assert served["decode"](np.asarray(live)).shape == (k, 32, 32, 3)

    # HTTP server passes symbolic-batch requests through unpadded
    import io
    import threading
    import urllib.request

    from vit_tpu.serve.server import make_server

    srv = make_server(str(out), port=0, warmup=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        buf = io.BytesIO()
        np.save(buf, np.random.rand(3, 32, 32, 3).astype(np.float32))
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_address[1]}/encode",
            data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as resp:
            assert np.load(io.BytesIO(resp.read())).shape == (3, 8)
    finally:
        srv.shutdown()


def test_export_videogpt_rollout(tmp_path):
    from vit_tpu.models.videogpt import VideoGPT, VideoGPTConfig, generate
    from vit_tpu.serve.export import export_videogpt

    cfg = VideoGPTConfig(frame_size=4, codebook_size=16, transformer="S",
                         max_frames=4, attn_impl="xla")
    model = VideoGPT(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, 16)
    # the model's __call__ takes (B, T, N) frame tokens; generate takes (B, L)
    params = model.init(jax.random.PRNGKey(1),
                        tokens[:1].reshape(1, 2, 4))["params"]
    ckpt_dir = _save_ckpt(tmp_path, params, cfg)

    out = export_videogpt(ckpt_dir, str(tmp_path / "export"), cond_frames=2,
                          gen_frames=2, bs=2, platforms=("cpu",))
    served = load_exported(out)
    assert served["manifest"]["functions"] == ["generate"]
    assert served["manifest"]["input_shape"] == [2, 8]

    live = generate(model, params, tokens, 8)         # (2, 16) greedy rollout
    np.testing.assert_array_equal(np.asarray(live),
                                  np.asarray(served["generate"](tokens)))

    # sampled variant: artifact gains a scalar seed input; same seed ==
    # same rollout == the live sampled generate
    out2 = export_videogpt(ckpt_dir, str(tmp_path / "export_t"), cond_frames=2,
                           gen_frames=2, bs=2, platforms=("cpu",),
                           temperature=1.0, top_k=8)
    served2 = load_exported(out2)
    assert served2["manifest"]["temperature"] == 1.0
    seed = np.uint32(11)
    s1 = np.asarray(served2["generate"](tokens, seed))
    s2 = np.asarray(served2["generate"](tokens, seed))
    np.testing.assert_array_equal(s1, s2)
    live_s = generate(model, params, tokens, 8, temperature=1.0, top_k=8,
                      rng=jax.random.PRNGKey(seed))
    np.testing.assert_array_equal(s1, np.asarray(live_s))

    # the single-array HTTP server must exclude the two-input artifact
    from vit_tpu.serve.server import make_server

    import threading

    srv = make_server(str(out2), port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        import json
        import urllib.request

        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.server_address[1]}/manifest") as r:
            json.load(r)  # server builds and answers; generate not POSTable
        import urllib.error

        buf_ = __import__("io").BytesIO()
        np.save(buf_, np.asarray(tokens))
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{srv.server_address[1]}/generate",
                data=buf_.getvalue(), method="POST"))
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()


def test_export_rejects_pallas_from_cpu_host(tmp_path):
    """attn_impl='pallas' on a non-TPU host would bake interpret-mode kernels
    into the artifact — rejected up front (tests run on the CPU backend)."""
    import pytest

    cfg = _tiny_cfg()
    model = TiTok(cfg)
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), images)["params"]
    ckpt_dir = _save_ckpt(tmp_path, params, cfg)
    with pytest.raises(ValueError, match="TPU host"):
        export_tokenizer(ckpt_dir, str(tmp_path / "export"), bs=1,
                         platforms=("tpu",), attn_impl="pallas")
