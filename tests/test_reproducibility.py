"""Determinism: same seed → bit-identical training (SURVEY.md §5 — the reference is
non-reproducible by construction: no seeding, cudnn.benchmark=True). Explicit PRNG
key threading makes reproducibility a free win here; this test pins it."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.models.titok import TiTok, TiTokConfig
from vit_tpu.train.optim import make_optimizer
from vit_tpu.train.state import TrainState
from vit_tpu.train.step import make_tokenizer_train_step


def _run(seed: int, steps: int = 5):
    cfg = TiTokConfig(image_size=16, patch_size=4, latent_tokens=8, codebook_size=32,
                      latent_dim=6, transformer="S", dtype=jnp.float32,
                      attn_impl="xla")
    for name in ("enc_vit_config", "dec_vit_config"):
        sub = getattr(cfg, name)
        sub.trans_config = sub.trans_config.replace(n_layers=2, n_heads=2, n_embd=32)
    model = TiTok(cfg)
    rng = jax.random.PRNGKey(seed)
    images = jax.random.uniform(jax.random.PRNGKey(seed + 1), (4, 16, 16, 3))
    params = model.init(rng, images)["params"]
    tx = make_optimizer(1e-3, 2, 100, 1e-4, 1e-4, clip_norm=1.0)
    state = TrainState.create(params, tx)
    step = jax.jit(make_tokenizer_train_step(model))
    usage = jnp.zeros((cfg.codebook_size,))
    for _ in range(steps):
        state, usage, metrics, _ = step(state, images, usage, rng)
    return state, metrics


def test_same_seed_bitwise_identical():
    s1, m1 = _run(0)
    s2, m2 = _run(0)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m1["train/loss"]) == float(m2["train/loss"])


def test_different_seed_differs():
    s1, _ = _run(0)
    s2, _ = _run(1)
    diff = any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                               jax.tree_util.tree_leaves(s2.params)))
    assert diff
