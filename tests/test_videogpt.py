"""VideoGPT: forward/loss semantics and KV-cache generation parity vs naive decode."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.models.videogpt import (VideoGPT, VideoGPTConfig, generate,
                                     generate_frames)


def tiny_config(**kw):
    defaults = dict(frame_size=4, codebook_size=16, transformer="S", max_frames=4,
                    dropout=0.0, dtype=jnp.float32, attn_impl="xla")
    defaults.update(kw)
    cfg = VideoGPTConfig(**defaults)
    cfg.trans_config = cfg.trans_config.replace(n_layers=2, n_heads=2, n_embd=32)
    cfg.n_embd = 32
    return cfg


def test_forward_loss_matches_manual_ce():
    cfg = tiny_config()
    model = VideoGPT(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (2, 4, 4), 0, cfg.codebook_size)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    logits, loss = model.apply({"params": params}, x)
    assert logits.shape == (2, 16, cfg.codebook_size)
    y = np.asarray(x).reshape(2, -1)
    lp = jax.nn.log_softmax(logits, axis=-1)
    want = -np.mean([lp[b, i, y[b, i]] for b in range(2) for i in range(16)])
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def _naive_generate(model, params, tokens, n):
    """The reference's O(n²) greedy loop (train_videogpt.py:56-65): full re-forward,
    argmax of the last position, append."""
    cfg = model.config
    tokens = np.asarray(tokens)
    for _ in range(n):
        b, l = tokens.shape
        sos = np.full((b, 1), cfg.codebook_size, np.int32)
        x = jnp.asarray(np.concatenate([sos, tokens], axis=-1))
        emb = (jnp.take(params["tok_embed"], x, axis=0)
               + params["pos_embed"][None, : l + 1])
        h = model.apply({"params": params}, emb, True, None,
                        method=lambda m, *a: m.transformer(*a))
        logits = (h[:, -1].astype(jnp.float32)
                  @ params["proj"]["kernel"] + params["proj"]["bias"])
        nxt = np.asarray(jnp.argmax(logits, axis=-1))[:, None]
        tokens = np.concatenate([tokens, nxt], axis=-1)
    return tokens


def test_kv_cache_generation_matches_naive():
    cfg = tiny_config()
    model = VideoGPT(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (2, 4, 4), 0, cfg.codebook_size)
    params = model.init(jax.random.PRNGKey(1), x)["params"]

    cond = jnp.asarray(np.asarray(x).reshape(2, -1)[:, :8])
    got = np.asarray(generate(model, params, cond, 6))
    want = _naive_generate(model, params, cond, 6)
    np.testing.assert_array_equal(got, want)


def test_generate_frames_shape():
    cfg = tiny_config()
    model = VideoGPT(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (2, 4, 4), 0, cfg.codebook_size)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    out = generate_frames(model, params, x[:, :2], 2)
    assert out.shape == (2, 4 * cfg.frame_size)
    # conditioning prefix is preserved
    np.testing.assert_array_equal(np.asarray(out)[:, :8],
                                  np.asarray(x).reshape(2, -1)[:, :8])


def test_train_step_decreases_loss():
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState

    cfg = tiny_config()
    model = VideoGPT(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (4, 4, 4), 0, cfg.codebook_size)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    tx = make_optimizer(3e-3, 1, 1000, 3e-4, 1e-4, clip_norm=None)
    state = TrainState.create(params, tx)

    @jax.jit
    def step(state, x):
        def loss_fn(p):
            _, loss = model.apply({"params": p}, x)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    first = None
    for _ in range(30):
        state, loss = step(state, x)
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_sampled_generation():
    """temperature/top_k decoding: reproducible under a fixed rng, emits only
    valid codebook ids, top_k=1 reduces to greedy, and temperature=0 (the
    default) is untouched reference semantics."""
    cfg = tiny_config()
    model = VideoGPT(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (2, 2, 4), 0,
                           cfg.codebook_size)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    cond = np.asarray(x).reshape(2, -1)[:, :4]
    cond = jnp.asarray(cond)

    greedy = np.asarray(generate(model, params, cond, 6))

    rng = jax.random.PRNGKey(7)
    s1 = np.asarray(generate(model, params, cond, 6, temperature=1.0,
                             rng=rng))
    s2 = np.asarray(generate(model, params, cond, 6, temperature=1.0,
                             rng=rng))
    np.testing.assert_array_equal(s1, s2)          # fixed rng → reproducible
    assert s1.min() >= 0 and s1.max() < cfg.codebook_size
    np.testing.assert_array_equal(s1[:, :4], np.asarray(cond))  # prefix kept

    topk1 = np.asarray(generate(model, params, cond, 6, temperature=0.7,
                                top_k=1, rng=rng))
    np.testing.assert_array_equal(topk1, greedy)   # top_k=1 == argmax

    import pytest

    with pytest.raises(ValueError, match="requires rng"):
        generate(model, params, cond, 6, temperature=1.0)
