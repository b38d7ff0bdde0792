"""ViT model + train step: shapes, patch-embed ≡ conv parity, loss decreases."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vit_tpu.models.vit import PatchEmbed, ViT, ViTClassifier, ViTConfig
from vit_tpu.train.optim import make_optimizer
from vit_tpu.train.state import TrainState
from vit_tpu.train.step import make_classifier_eval_step, make_classifier_train_step


def tiny_vit_config(**kw):
    defaults = dict(image_size=16, in_channels=3, patch_size=4, transformer="S",
                    extra_tokens=1, dropout=0.0, dtype=jnp.float32, attn_impl="xla")
    defaults.update(kw)
    cfg = ViTConfig(**defaults)
    # shrink the transformer for test speed
    cfg.trans_config = cfg.trans_config.replace(n_layers=2, n_heads=2, n_embd=32)
    return cfg


def test_patch_embed_equals_strided_conv():
    """reshape+GEMM patch embed ≡ reference nn.Conv2d stride=patch (train_vit.py:34)."""
    p, c, d = 4, 3, 8
    pe = PatchEmbed(patch_size=p, n_embd=d, in_channels=c, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, c), jnp.float32)
    params = pe.init(jax.random.PRNGKey(1), x)["params"]
    out = pe.apply({"params": params}, x)

    # torch conv with the same weights: dense kernel (p*p*c, d) with feature order
    # (p1, p2, c) -> conv weight (d, c, p, p)
    w = np.asarray(params["proj"]["kernel"]).reshape(p, p, c, d)
    w_t = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())
    b_t = torch.from_numpy(np.asarray(params["proj"]["bias"]))
    x_t = torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)).copy())
    ref = torch.nn.functional.conv2d(x_t, w_t, b_t, stride=p)
    ref = ref.flatten(2).transpose(1, 2).numpy()  # b c h w -> b (h w) c
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_vit_shapes_and_token_order():
    cfg = tiny_vit_config(extra_tokens=3)
    model = ViT(cfg)
    x = jnp.ones((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 3 + cfg.n_patches, cfg.trans_config.n_embd)


def test_classifier_shape():
    cfg = tiny_vit_config()
    model = ViTClassifier(cfg, num_classes=10)
    x = jnp.ones((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    logits = model.apply({"params": params}, x)
    assert logits.shape == (2, 10)


def test_train_step_decreases_loss():
    cfg = tiny_vit_config()
    model = ViTClassifier(cfg, num_classes=4)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (8, 16, 16, 3))
    labels = jnp.array([0, 1, 2, 3, 0, 1, 2, 3])
    params = model.init(jax.random.PRNGKey(1), images)["params"]
    tx = make_optimizer(lr=1e-3, warmup_steps=1, train_steps=100, min_lr=1e-4,
                        weight_decay=1e-2)
    state = TrainState.create(params, tx)
    train_step = jax.jit(make_classifier_train_step(model))
    eval_step = jax.jit(make_classifier_eval_step(model))

    first = float(eval_step(state.params, images, labels)["valid/loss"])
    for _ in range(30):
        state, metrics = train_step(state, images, labels, rng)
    last = float(eval_step(state.params, images, labels)["valid/loss"])
    assert last < first, (first, last)
    assert int(state.step) == 30


def test_lr_schedule_matches_sequentiallr_semantics():
    """Golden check of the SequentialLR composition against torch (utils.py:5-9)."""
    from vit_tpu.train.optim import get_lr_schedule

    lr, warm, total, min_lr = 1e-3, 10, 100, 1e-4
    sched = get_lr_schedule(lr, warm, total, min_lr)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)
    warmup = torch.optim.lr_scheduler.LambdaLR(opt, lambda s: min(1, s / warm))
    cos = torch.optim.lr_scheduler.CosineAnnealingLR(opt, total, eta_min=min_lr)
    const = torch.optim.lr_scheduler.LambdaLR(opt, lambda _: 1)
    seq = torch.optim.lr_scheduler.SequentialLR(opt, [warmup, cos, const],
                                                [warm, total])
    for step in range(120):
        got = float(sched(step))
        want = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9,
                                   err_msg=f"step {step}")
        opt.step()
        seq.step()
