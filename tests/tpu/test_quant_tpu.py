"""Real-chip int8 serving path: the dynamic-activation int8 matmul
(vit_tpu/core/quant.py) lowers to a native int8×int8→int32 MXU contraction on
TPU hardware, and a quantized export artifact executes on the chip tracking
its fp twin. Complements the CPU coverage in tests/test_quant.py — this pins
the int8 numerics of the actual TPU lowering (CPU int8 dot_general uses a
different backend path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="real TPU only")


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_int8_matmul_on_mxu():
    from vit_tpu.core.quant import int8_matmul, quantize_kernel

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    # MXU-native tile sizes; bf16 activations as on the serving path
    x = jax.random.normal(k1, (8, 256, 512), jnp.bfloat16)
    w = jax.random.normal(k2, (512, 768), jnp.float32) * 0.1
    q, s = quantize_kernel(w)
    y = jax.jit(int8_matmul)(x, q, s)
    ref = jnp.dot(x.astype(jnp.float32), w,
                  precision=jax.lax.Precision.HIGHEST)
    assert y.dtype == jnp.float32
    assert _rel(y, ref) < 0.02

    # the int32 accumulator is exact: an integer problem that quantizes
    # losslessly must round-trip bit-perfectly through the TPU int8 dot
    # (catches any fp-fallback lowering, whose bf16 pass would round).
    # x rows span [-127, 127] ints ⇒ s_x = 1 exactly; identity kernel ⇒
    # scale = 1/127 with q = 127·I, so y = x exactly.
    xi = np.random.default_rng(0).integers(-126, 127, (4, 128, 256))
    xi[..., 0] = 127                             # pin per-row absmax to 127
    xi = jnp.asarray(xi, jnp.float32)
    qi, si = quantize_kernel(jnp.eye(256, dtype=jnp.float32))
    np.testing.assert_array_equal(np.asarray(jax.jit(int8_matmul)(xi, qi, si)),
                                  np.asarray(xi))


def test_quantized_export_runs_on_tpu(tmp_path):
    from vit_tpu.models.titok import TiTok, TiTokConfig
    from vit_tpu.serve.export import export_tokenizer, load_exported
    from vit_tpu.train.checkpoint import Checkpointer
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState

    cfg = TiTokConfig(image_size=32, patch_size=8, latent_tokens=8,
                      codebook_size=64, latent_dim=6, transformer="S")
    model = TiTok(cfg)
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3),
                                jnp.float32)
    params = model.init(jax.random.PRNGKey(1), images[:1])["params"]
    ckpt = Checkpointer(str(tmp_path / "ckpt"), mode="min")
    ckpt.save_if_best(TrainState.create(
        params, make_optimizer(1e-4, 1, 10, 1e-5, 0.0)), 1.0, config=cfg)
    ckpt.finalize()

    out = export_tokenizer(str(tmp_path / "ckpt"), str(tmp_path / "q"),
                           bs=2, platforms=("tpu",), quantize="int8")
    served = load_exported(out)
    man = served["manifest"]
    assert man["quantize"] == "int8"
    # fidelity probe ran on this chip at export time
    assert man["quant_encode_index_agreement"] > 0.5
    assert man["quant_decode_psnr_db_vs_fp"] > 20.0

    idx_q = np.asarray(served["encode"](images))
    img_q = np.asarray(served["decode"](idx_q))
    idx = np.asarray(model.apply({"params": params}, images,
                                 method=model.encode))
    img = np.asarray(model.apply({"params": params}, jnp.asarray(idx),
                                 method=model.decode_indices))
    assert float((idx_q == idx).mean()) > 0.5
    assert _rel(img_q, img) < 0.06
