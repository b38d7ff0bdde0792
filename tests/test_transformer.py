"""Golden parity: Flax transformer core vs the reference math rebuilt in torch.

The torch model below re-expresses the reference's pre-LN block semantics
(transformer.py:16-45): qkv Linear → SDPA → residual; LN without affine params;
4× GELU MLP. Weights are copied from the Flax params so outputs must agree to 1e-3.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vit_tpu.core.config import TransformerConfig
from vit_tpu.core.transformer import Transformer

TOL = 1e-3


def torch_reference_forward(params, x, cfg: TransformerConfig):
    """Reference transformer math in torch, parameterized by the Flax param tree."""
    t = torch.from_numpy(np.asarray(x, dtype=np.float32))
    for i in range(cfg.n_layers):
        lp = params[f"layer_{i}"]
        w_qkv = torch.from_numpy(np.asarray(lp["attn"]["qkv"]["kernel"]))
        b_qkv = torch.from_numpy(np.asarray(lp["attn"]["qkv"]["bias"]))
        # attn: pre-LN (no affine), fused qkv, SDPA, no out-proj
        h = F.layer_norm(t, (cfg.n_embd,))
        qkv = h @ w_qkv + b_qkv
        b, n, _ = qkv.shape
        qkv = qkv.view(b, n, 3, cfg.n_heads, cfg.head_dim).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = F.scaled_dot_product_attention(q, k, v, is_causal=cfg.causal)
        attn = attn.permute(0, 2, 1, 3).reshape(b, n, cfg.n_embd)
        t = t + attn
        # mlp: pre-LN, fc1 → exact gelu → fc2
        h = F.layer_norm(t, (cfg.n_embd,))
        w1 = torch.from_numpy(np.asarray(lp["mlp"]["fc1"]["kernel"]))
        b1 = torch.from_numpy(np.asarray(lp["mlp"]["fc1"]["bias"]))
        w2 = torch.from_numpy(np.asarray(lp["mlp"]["fc2"]["kernel"]))
        b2 = torch.from_numpy(np.asarray(lp["mlp"]["fc2"]["bias"]))
        t = t + (F.gelu(h @ w1 + b1) @ w2 + b2)
    return t.numpy()


def _run(causal):
    cfg = TransformerConfig(n_layers=2, n_heads=2, n_embd=16, block_size=12,
                            causal=causal, dtype=jnp.float32, attn_impl="xla")
    model = Transformer(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 12, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    out = model.apply({"params": params}, x)
    ref = torch_reference_forward(params, x, cfg)
    np.testing.assert_allclose(np.asarray(out), ref, atol=TOL, rtol=TOL)


def test_transformer_matches_torch_dense():
    _run(causal=False)


def test_transformer_matches_torch_causal():
    _run(causal=True)


def test_presets():
    from vit_tpu.core.config import transformer_configs

    s = transformer_configs["S"](block_size=64)
    b = transformer_configs["B"](block_size=64)
    l = transformer_configs["L"](block_size=64)
    assert (s.n_layers, s.n_heads, s.n_embd) == (6, 8, 512)
    assert (b.n_layers, b.n_heads, b.n_embd) == (12, 12, 768)
    assert (l.n_layers, l.n_heads, l.n_embd) == (24, 16, 1024)
    assert s.head_dim == 64 and b.head_dim == 64 and l.head_dim == 64


def test_dropout_changes_output_in_training_mode():
    cfg = TransformerConfig(n_layers=1, n_heads=2, n_embd=16, block_size=8,
                            dropout=0.5, dtype=jnp.float32, attn_impl="xla")
    model = Transformer(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    det = model.apply({"params": params}, x, True)
    tr1 = model.apply({"params": params}, x, False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    tr2 = model.apply({"params": params}, x, False,
                      rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(det), np.asarray(tr1))
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))


def test_recording_clip_matches_optax_and_exposes_norm():
    import optax

    from vit_tpu.train.optim import (clip_by_global_norm_recording,
                                     last_grad_norm)

    grads = {"a": jnp.full((4, 4), 3.0), "b": jnp.full((2,), -1.5)}
    ours = clip_by_global_norm_recording(1.0)
    ref = optax.clip_by_global_norm(1.0)
    s1 = ours.init(grads)
    u1, s1 = ours.update(grads, s1)
    u2, _ = ref.update(grads, ref.init(grads))
    for a, b in zip(jax.tree.leaves(u1), jax.tree.leaves(u2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    expected = float(optax.global_norm(grads))
    assert abs(float(last_grad_norm((s1,))) - expected) < 1e-6


def test_train_step_reports_grad_norm():
    from vit_tpu.models.vit import ViT, ViTClassifier, ViTConfig
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState
    from vit_tpu.train.step import make_classifier_train_step

    cfg = ViTConfig(image_size=16, in_channels=3, patch_size=8,
                    transformer="S", extra_tokens=1, dropout=0.0,
                    dtype=jnp.float32)
    cfg.trans_config = cfg.trans_config.replace(n_layers=1, n_heads=2, n_embd=32)
    cfg.n_embd = 32
    model = ViTClassifier(cfg, num_classes=4)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    y = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    state = TrainState.create(params, make_optimizer(1e-3, 2, 10, 1e-4, 0.0))
    state, metrics = jax.jit(make_classifier_train_step(model))(
        state, x, y, jax.random.PRNGKey(2))
    assert float(metrics["train/grad_norm"]) > 0.0
