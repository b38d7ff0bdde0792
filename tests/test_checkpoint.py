"""Orbax checkpointing: roundtrip, best-metric gating, resume continuation."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.train.checkpoint import Checkpointer
from vit_tpu.train.optim import make_optimizer
from vit_tpu.train.state import TrainState


def _state(value=0.0):
    params = {"w": jnp.full((4, 4), value), "b": jnp.zeros((4,))}
    tx = make_optimizer(1e-3, 2, 100, 1e-4, 1e-2)
    return TrainState.create(params, tx)


def test_save_restore_roundtrip(tmp_path):
    state = _state(1.5)
    state = state.apply_gradients(jax.tree.map(jnp.ones_like, state.params))
    ckpt = Checkpointer(str(tmp_path), mode="min")
    ckpt.save(state, config={"image_size": 32}, tag="last")
    # saves are async (disk write in a background thread): finalize() before
    # reading the checkpoint back from a DIFFERENT Checkpointer instance
    ckpt.finalize()

    restored = Checkpointer(str(tmp_path)).restore(_state(0.0), tag="last")
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_metric_gating(tmp_path):
    ckpt = Checkpointer(str(tmp_path), mode="min")
    assert ckpt.save_if_best(_state(1.0), 0.5) is True
    assert ckpt.save_if_best(_state(2.0), 0.7) is False   # worse: not saved
    assert ckpt.save_if_best(_state(3.0), 0.3) is True
    restored = ckpt.restore(_state(0.0), tag="best")
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full((4, 4), 3.0, np.float32))
    # a fresh Checkpointer learns the previous best from meta
    ckpt2 = Checkpointer(str(tmp_path), mode="min")
    ckpt2.restore(_state(0.0), tag="best")
    assert ckpt2.best == 0.3
    assert ckpt2.save_if_best(_state(4.0), 0.4) is False


def test_resume_continues_training(tmp_path):
    state = _state(1.0)
    grads = jax.tree.map(jnp.ones_like, state.params)
    for _ in range(3):
        state = state.apply_gradients(grads)
    writer = Checkpointer(str(tmp_path))
    writer.save(state, tag="last")
    writer.finalize()

    resumed = Checkpointer(str(tmp_path)).restore(_state(0.0), tag="last")
    state_cont = state.apply_gradients(grads)
    resumed_cont = resumed.apply_gradients(grads)
    assert int(resumed_cont.step) == 4
    np.testing.assert_allclose(np.asarray(state_cont.params["w"]),
                               np.asarray(resumed_cont.params["w"]), atol=1e-7)


def test_bf16_adam_mu_trains_and_checkpoints(tmp_path):
    """--adam_mu_dtype bfloat16: moment dtype honored, loss finite, orbax
    roundtrip preserves the bf16 accumulator."""
    import jax
    import jax.numpy as jnp
    import optax

    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState

    params = {"w": jnp.ones((8, 8)), "b": jnp.zeros((8,))}
    tx = make_optimizer(1e-3, 2, 10, 1e-4, 1e-4, clip_norm=1.0,
                        mu_dtype="bfloat16")
    state = TrainState.create(params, tx)
    mus = [l for l in jax.tree.leaves(state.opt_state)
           if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert mus, "no bf16 first-moment leaves found"

    def loss(p, x):
        return jnp.sum((x @ p["w"] + p["b"]) ** 2)

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    g = jax.grad(loss)(state.params, x)
    state2 = state.apply_gradients(g)
    assert jnp.isfinite(loss(state2.params, x))

    from vit_tpu.train.checkpoint import Checkpointer
    ckpt = Checkpointer(str(tmp_path), mode="min")
    ckpt.save(state2, tag="best")
    restored = ckpt.restore(TrainState.create(params, tx), tag="best")
    r_mus = [l for l in jax.tree.leaves(restored.opt_state)
             if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert len(r_mus) == len(mus)


def test_extra_tree_roundtrip_and_back_compat(tmp_path):
    """Auxiliary mutable collections (train_tatitok's clustering-EMA vq_stats)
    ride the checkpoint as an optional "extra" tree; checkpoints written
    without one still restore when an extra_template is supplied."""
    extra = {"vq_stats": {"ema_counts": jnp.arange(8.0),
                          "ema_sums": jnp.ones((8, 4))}}
    ckpt = Checkpointer(str(tmp_path / "with"), mode="min")
    ckpt.save(_state(1.0), tag="last", extra=extra)
    ckpt.finalize()
    template = jax.tree.map(jnp.zeros_like, extra)
    restored, r_extra = Checkpointer(str(tmp_path / "with")).restore(
        _state(0.0), tag="last", extra_template=template)
    assert int(restored.step) == 0
    np.testing.assert_array_equal(
        np.asarray(r_extra["vq_stats"]["ema_counts"]), np.arange(8.0))
    np.testing.assert_array_equal(
        np.asarray(r_extra["vq_stats"]["ema_sums"]), np.ones((8, 4)))

    # pre-extra checkpoint + extra_template: restores state, extra is None
    old = Checkpointer(str(tmp_path / "old"), mode="min")
    old.save(_state(2.0), tag="last")
    old.finalize()
    restored2, r_extra2 = Checkpointer(str(tmp_path / "old")).restore(
        _state(0.0), tag="last", extra_template=template)
    np.testing.assert_array_equal(np.asarray(restored2.params["w"]),
                                  np.full((4, 4), 2.0))
    assert r_extra2 is None

    # extra-carrying checkpoint restored WITHOUT a template: plain state
    plain = Checkpointer(str(tmp_path / "with")).restore(_state(0.0),
                                                         tag="last")
    np.testing.assert_array_equal(np.asarray(plain.params["w"]),
                                  np.full((4, 4), 1.0))


def test_crash_safe_save_keeps_previous_tag(tmp_path):
    """The async write lands in .{tag}.tmp and is only promoted at a durability
    barrier — a crash mid-save must leave the previous checkpoint restorable."""
    ckpt = Checkpointer(str(tmp_path), mode="min")
    ckpt.save(_state(1.0), tag="last")
    ckpt.finalize()

    # second save kicked off but the process "crashes" before any barrier:
    # simulate by abandoning the Checkpointer without finalize()
    ckpt.save(_state(2.0), tag="last")
    ckpt._ckptr.wait_until_finished()   # write durable, swap NOT applied
    assert (tmp_path / ".last.tmp").exists()

    # a fresh process restores the previous (v1) checkpoint
    fresh = Checkpointer(str(tmp_path))
    restored = fresh.restore(_state(0.0), tag="last")
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full((4, 4), 1.0))

    # the stale tmp dir is cleaned up by the next save, which then promotes
    fresh.save(_state(3.0), tag="last")
    fresh.finalize()
    assert not (tmp_path / ".last.tmp").exists()
    restored = Checkpointer(str(tmp_path)).restore(_state(0.0), tag="last")
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full((4, 4), 3.0))


def test_save_promotes_at_next_barrier(tmp_path):
    ckpt = Checkpointer(str(tmp_path), mode="min")
    ckpt.save(_state(5.0), tag="last")
    # restore() is itself a barrier: it promotes the pending write
    restored = ckpt.restore(_state(0.0), tag="last")
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full((4, 4), 5.0))
    assert (tmp_path / "last").exists()
    assert not (tmp_path / ".last.tmp").exists()
