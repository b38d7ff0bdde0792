"""Int8 serving quantization (vit_tpu/core/quant.py).

The reference has no quantization story; this is a TPU-native addition
(v5e MXU int8 peak is 2× bf16, weights stream at 1 byte). Pins:
  * kernel quantization round-trip error bound,
  * int8_matmul vs fp32 matmul relative error,
  * the quantized TiTok twin tracking the fp model (latents, indices, pixels),
  * quantize_params tree conversion incl. the affine-LayerNorm "scale"
    name-collision case,
  * the export path: quantize="int8" artifacts load, run, carry int8 leaves.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.core.quant import int8_matmul, quantize_kernel, quantize_params


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_quantize_kernel_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48)) * 0.3
    q, s = quantize_kernel(w)
    assert q.dtype == jnp.int8 and s.shape == (48,)
    deq = q.astype(jnp.float32) * s
    # symmetric 127-level grid: per-element error ≤ scale/2 = absmax/254
    assert np.max(np.abs(np.asarray(deq - w))) <= float(np.max(s)) / 2 + 1e-7
    # N(0, 0.3²) kernel: absmax≈3.3σ per column → relative RMS error
    # ≈ (absmax/127)/(σ·√12) ≈ 0.0075; measured 0.0059
    assert _rel(deq, w) < 0.01


def test_int8_matmul_tracks_fp():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (4, 32, 96))
    w = jax.random.normal(k2, (96, 128)) * 0.1
    q, s = quantize_kernel(w)
    y_q = int8_matmul(x, q, s)
    y_fp = jnp.dot(x, w)
    assert y_q.dtype == jnp.float32
    # two symmetric int8 operands: ~1% relative RMS error
    assert _rel(y_q, y_fp) < 0.02


def test_int8_matmul_scale_invariance():
    # dynamic per-row activation scaling: scaling a row by 1000x must not
    # degrade its quantization (absmax is per-row, not per-batch)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 64))
    x = x.at[0].mul(1000.0)
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 32)) * 0.1
    q, s = quantize_kernel(w)
    y = int8_matmul(x, q, s)
    ref = jnp.dot(x, w)
    assert _rel(y[0], ref[0]) < 0.02
    assert _rel(y[1], ref[1]) < 0.02


def _titok_pair(quantizer="vq"):
    from vit_tpu.models.titok import TiTok, TiTokConfig

    kw = dict(image_size=32, patch_size=8, latent_tokens=8, codebook_size=64,
              latent_dim=6, transformer="S", quantizer=quantizer)
    return TiTok(TiTokConfig(**kw)), TiTok(TiTokConfig(**kw, quant="int8"))


def test_quantized_titok_tracks_fp():
    model, qmodel = _titok_pair()
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 32, 32, 3))
    params = model.init(rng, x)["params"]
    target = jax.eval_shape(qmodel.init, rng, x)["params"]
    qparams = quantize_params(target, params)

    # int8 leaves exist exactly at the block Dense sites
    leaves = {"/".join(p.key for p in path): leaf.dtype
              for path, leaf in
              jax.tree_util.tree_flatten_with_path(qparams)[0]}
    int8_keys = sorted(k for k, d in leaves.items() if d == jnp.int8)
    assert int8_keys and all(k.endswith("kernel_q") for k in int8_keys)
    assert any("qkv" in k for k in int8_keys)
    assert any("fc1" in k for k in int8_keys)

    lat = model.apply({"params": params}, x, method=lambda m, v: m.enc(v))
    lat_q = qmodel.apply({"params": qparams}, x, method=lambda m, v: m.enc(v))
    assert _rel(lat_q, lat) < 0.05

    idx = model.apply({"params": params}, x, method=model.encode)
    idx_q = qmodel.apply({"params": qparams}, x, method=qmodel.encode)
    # random-init model: most codes agree; a trained model does better because
    # latents sit further from VQ decision boundaries
    assert float((idx == idx_q).mean()) > 0.5

    img = model.apply({"params": params}, idx, method=model.decode_indices)
    img_q = qmodel.apply({"params": qparams}, idx, method=qmodel.decode_indices)
    assert _rel(img_q, img) < 0.05


def test_quantize_params_ln_affine_scale_passthrough():
    # ln_affine LayerNorms also own a param named "scale"; conversion must
    # copy it verbatim (only "scale" siblinged by "kernel_q" is synthesized)
    from vit_tpu.core.config import bytedance_config
    from vit_tpu.core.transformer import Transformer

    cfg = bytedance_config("small", block_size=16)
    qcfg = bytedance_config("small", block_size=16, quant="int8")
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 16, cfg.n_embd))
    params = Transformer(cfg).init(rng, x)["params"]
    target = jax.eval_shape(Transformer(qcfg).init, rng, x)["params"]
    qparams = quantize_params(target, params)
    ln = qparams["layer_0"]["ln1"]
    np.testing.assert_array_equal(np.asarray(ln["scale"]),
                                  np.asarray(params["layer_0"]["ln1"]["scale"]))
    # out_proj exists under ln_affine presets and is quantized
    assert qparams["layer_0"]["attn"]["out_proj"]["kernel_q"].dtype == jnp.int8
    y = Transformer(qcfg).apply({"params": qparams}, x)
    yf = Transformer(cfg).apply({"params": params}, x)
    assert _rel(y, yf) < 0.05


def test_quantize_params_shape_mismatch_raises():
    with pytest.raises(ValueError, match="shape mismatch"):
        quantize_params({"a": jax.ShapeDtypeStruct((2, 3), jnp.float32)},
                        {"a": jnp.zeros((3, 2))})


def test_export_quantized_tokenizer(tmp_path):
    from vit_tpu.models.titok import TiTok, TiTokConfig
    from vit_tpu.serve.export import export_tokenizer, load_exported
    from vit_tpu.train.checkpoint import Checkpointer
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState

    cfg = TiTokConfig(image_size=32, patch_size=8, latent_tokens=8,
                      codebook_size=64, latent_dim=6, transformer="S")
    model = TiTok(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (2, 32, 32, 3), jnp.float32)
    params = model.init(rng, images[:1])["params"]
    ckpt = Checkpointer(str(tmp_path / "ckpt"), mode="min")
    ckpt.save_if_best(TrainState.create(
        params, make_optimizer(1e-4, 1, 10, 1e-5, 0.0)), 1.0, config=cfg)
    ckpt.finalize()

    backend = jax.default_backend()
    out = export_tokenizer(str(tmp_path / "ckpt"), str(tmp_path / "q"),
                           bs=2, platforms=(backend,), quantize="int8")
    served = load_exported(out)
    man = served["manifest"]
    assert man["quantize"] == "int8"
    # the export-time fidelity probe (serve/export.py:_quant_fidelity) records
    # the accuracy cost in the manifest; random-init bounds are loose — a
    # trained tokenizer's latents sit further from VQ decision boundaries
    assert man["quant_encode_index_agreement"] > 0.5
    assert man["quant_decode_psnr_db_vs_fp"] > 20.0

    with np.load(out / "weights.npz") as npz:
        kq = [k for k in npz.files if k.endswith("kernel_q")]
        assert kq and all(npz[k].dtype == np.int8 for k in kq)
        # fp kernels at the quantized sites are gone from the artifact
        assert not any(k.endswith("qkv/kernel") for k in npz.files)

    idx_q = np.asarray(served["encode"](images))
    img_q = np.asarray(served["decode"](idx_q))
    idx = np.asarray(model.apply({"params": params}, images,
                                 method=model.encode))
    img = np.asarray(model.apply({"params": params}, jnp.asarray(idx),
                                 method=model.decode_indices))
    assert float((idx_q == idx).mean()) > 0.5
    assert _rel(img_q, img) < 0.06
    assert idx_q.shape == idx.shape and img_q.shape == img.shape


def test_export_quantized_classifier(tmp_path):
    from vit_tpu.models.vit import ViTClassifier, ViTConfig
    from vit_tpu.serve.export import export_classifier, load_exported
    from vit_tpu.train.checkpoint import Checkpointer
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState

    cfg = ViTConfig(image_size=32, in_channels=3, patch_size=8,
                    transformer="S", extra_tokens=1, dropout=0.0,
                    attn_impl="xla")
    model = ViTClassifier(cfg, num_classes=7)
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3),
                                jnp.float32)
    params = model.init(jax.random.PRNGKey(1), images[:1])["params"]
    ckpt = Checkpointer(str(tmp_path / "ckpt"), mode="max")
    ckpt.save_if_best(TrainState.create(
        params, make_optimizer(1e-4, 1, 10, 1e-5, 0.0)), 0.5, config=cfg)
    ckpt.finalize()

    out = export_classifier(str(tmp_path / "ckpt"), str(tmp_path / "q"), bs=2,
                            platforms=(jax.default_backend(),),
                            quantize="int8")
    served = load_exported(out)
    assert served["manifest"]["quantize"] == "int8"
    with np.load(out / "weights.npz") as npz:
        assert any(k.endswith("kernel_q") for k in npz.files)
        # the head stays fp: only transformer-block Dense sites quantize
        assert "head/kernel" in npz.files

    live = model.apply({"params": params}, images, deterministic=True)
    logits_q = np.asarray(served["predict"](images))
    assert (np.asarray(live).argmax(-1) == logits_q.argmax(-1)).all()
    assert _rel(logits_q, live) < 0.05


def test_quantized_videogpt_decode_tracks_fp():
    # the KV-cached decode path (prefill + decode_step) runs through the same
    # quantized Dense sites; pin the prefill logits and that a full greedy
    # rollout executes with the int8 tree (AR argmax flips compound, so the
    # rollout itself is only shape/dtype-checked on a random-init model)
    from vit_tpu.models.videogpt import VideoGPT, VideoGPTConfig, generate

    cfg = VideoGPTConfig(4, 32, "S", 4, 0.0, dtype=jnp.float32)
    qcfg = VideoGPTConfig(4, 32, "S", 4, 0.0, dtype=jnp.float32,
                          quant="int8")
    model, qmodel = VideoGPT(cfg), VideoGPT(qcfg)
    rng = jax.random.PRNGKey(0)
    tokens = jnp.zeros((2, 2, 4), jnp.int32)
    params = model.init(rng, tokens)["params"]
    target = jax.eval_shape(qmodel.init, rng, tokens)["params"]
    qparams = quantize_params(target, params)

    logits, _ = model.apply({"params": params}, tokens)
    logits_q, _ = qmodel.apply({"params": qparams}, tokens)
    assert _rel(logits_q, logits) < 0.05

    cond = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 32)
    roll = generate(qmodel, qparams, cond, 4)
    assert roll.shape == (2, 12) and roll.dtype == jnp.int32
    assert (np.asarray(roll) >= 0).all() and (np.asarray(roll) < 32).all()
    np.testing.assert_array_equal(np.asarray(roll[:, :8]), np.asarray(cond))


def test_export_quantize_rejects_enhancing(tmp_path):
    from vit_tpu.serve.export import export_tokenizer

    with pytest.raises(ValueError, match="enhancing"):
        export_tokenizer(str(tmp_path), str(tmp_path / "o"),
                         model="enhancing", quantize="int8")


def test_export_quantize_rejects_unknown_mode(tmp_path):
    from vit_tpu.serve.export import export_tokenizer

    with pytest.raises(ValueError, match="unsupported quantize"):
        export_tokenizer(str(tmp_path), str(tmp_path / "o"), quantize="int4")
