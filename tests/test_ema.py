"""EMA (Polyak) weight averaging: --ema_decay on the tokenizer scripts.

The reference has no weight averaging; VQGAN-family recipes commonly eval and
deploy the EMA weights. Pins: the fused in-step update math, checkpoint
round-trip (incl. resuming an EMA run from a pre-EMA checkpoint), the
has_ema/load_params accessors, sharding specs covering the ema subtree, and
`export --use_ema` actually exporting the average.
"""

import os
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_tpu.train.checkpoint import Checkpointer, has_ema, load_params
from vit_tpu.train.optim import make_optimizer
from vit_tpu.train.state import TrainState


def _tree_allclose(a, b, **kw):
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x, np.float64), np.asarray(y, np.float64), **kw), a, b)


def test_ema_update_math():
    params = {"w": jnp.ones((3,)), "b": jnp.zeros(())}
    state = TrainState.create(params, optax.sgd(1.0), ema_decay=0.5)
    _tree_allclose(state.ema_params, params)  # seeded from params

    grads = {"w": jnp.full((3,), 0.5), "b": jnp.asarray(1.0)}
    state = jax.jit(lambda s: s.apply_gradients(grads))(state)
    # params: w=0.5, b=-1; ema = 0.5*old + 0.5*new
    _tree_allclose(state.params, {"w": jnp.full((3,), 0.5),
                                  "b": jnp.asarray(-1.0)})
    _tree_allclose(state.ema_params, {"w": jnp.full((3,), 0.75),
                                      "b": jnp.asarray(-0.5)})
    state = jax.jit(lambda s: s.apply_gradients(grads))(state)
    _tree_allclose(state.ema_params, {"w": jnp.full((3,), 0.375),
                                      "b": jnp.asarray(-1.25)})


def test_ema_off_keeps_pytree_identical():
    params = {"w": jnp.ones((2,))}
    state = TrainState.create(params, optax.sgd(1.0))
    assert state.ema_params is None
    flat_no = jax.tree_util.tree_structure(state)
    state2 = state.apply_gradients({"w": jnp.zeros((2,))})
    assert state2.ema_params is None
    assert jax.tree_util.tree_structure(state2) == flat_no


def test_ema_checkpoint_roundtrip(tmp_path):
    params = {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3)}}
    tx = make_optimizer(1e-2, 1, 10, 1e-3, 0.0)
    state = TrainState.create(params, tx, ema_decay=0.9)
    # make ema distinct from params so the round-trip is a real check
    state = state.replace(ema_params=jax.tree.map(lambda p: p * 0.5,
                                                  state.params))
    ckpt = Checkpointer(str(tmp_path), mode="min")
    ckpt.save_if_best(state, 1.0)
    ckpt.finalize()

    assert has_ema(str(tmp_path), "best")
    template = TrainState.create(params, tx, ema_decay=0.9)
    restored = Checkpointer(str(tmp_path)).restore(template, tag="best")
    _tree_allclose(restored.ema_params, state.ema_params)
    _tree_allclose(restored.params, state.params)

    _tree_allclose(load_params(str(tmp_path), "best", ema=True),
                   state.ema_params)


def test_resume_ema_from_pre_ema_checkpoint(tmp_path):
    params = {"w": jnp.ones((4,))}
    tx = make_optimizer(1e-2, 1, 10, 1e-3, 0.0)
    ckpt = Checkpointer(str(tmp_path), mode="min")
    ckpt.save_if_best(TrainState.create(params, tx), 1.0)  # no EMA on disk
    ckpt.finalize()
    assert not has_ema(str(tmp_path), "best")

    with pytest.raises(ValueError, match="no EMA"):
        load_params(str(tmp_path), "best", ema=True)

    # restoring into an --ema_decay run re-seeds the average from params
    template = TrainState.create(params, tx, ema_decay=0.99)
    restored = Checkpointer(str(tmp_path)).restore(template, tag="best")
    _tree_allclose(restored.ema_params, restored.params)


def test_state_shardings_cover_ema(tmp_path):
    from jax.sharding import Mesh
    from vit_tpu.parallel.sharding import state_shardings

    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "fsdp", "model"))
    params = {"layer_0": {"mlp": {"fc1": {"kernel": jnp.ones((8, 32))}}}}
    state = TrainState.create(params, optax.sgd(1.0), ema_decay=0.9)
    sh = state_shardings(mesh, state)
    # the ema subtree gets the same spec as the matching params leaf
    assert (sh.ema_params["layer_0"]["mlp"]["fc1"]["kernel"].spec
            == sh.params["layer_0"]["mlp"]["fc1"]["kernel"].spec)


def test_train_titok_ema_e2e(tmp_path):
    # the full script path: --ema_decay trains, checkpoints carry the average,
    # and it diverges from the live params (decay≈1 lags a warming-up model)
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).parent.parent
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
           "HOME": "/root",
           "VIT_TPU_RUN_DIR": os.environ["VIT_TPU_RUN_DIR"],
           "VIT_TPU_JAX_CACHE": str(tmp_path / "cache")}
    res = subprocess.run(
        [sys.executable, "train_titok.py", "--dataset", "synthetic",
         "--image_size", "32", "--patch_size", "8", "--latent_tokens", "8",
         "--codebook_size", "32", "--latent_dim", "4", "--transformer", "S",
         "--bs", "4", "--epochs", "1", "--steps_per_epoch", "6",
         "--warmup_steps", "2", "--train_steps", "50", "--log_every", "2",
         "--ckpt_every", "2", "--no_wandb", "--mixed", "false",
         "--ema_decay", "0.9", "--ckpt_dir", str(tmp_path / "ckpt")],
        capture_output=True, text=True, cwd=repo, env=env, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    # 'last' is written at the final step: the average must measurably lag
    # the live params there ('best' can land at step ~1 where they coincide)
    assert has_ema(str(tmp_path / "ckpt"), "last")
    live = load_params(str(tmp_path / "ckpt"), "last")
    ema = load_params(str(tmp_path / "ckpt"), "last", ema=True)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a, np.float64)
                                  - np.asarray(b, np.float64)).max()),
        live, ema))
    assert max(diffs) > 1e-5  # genuinely lags (steady-state ≈ lr·d/(1-d))


def test_export_use_ema(tmp_path):
    from vit_tpu.models.titok import TiTok, TiTokConfig
    from vit_tpu.serve.export import export_tokenizer, load_exported

    cfg = TiTokConfig(image_size=32, patch_size=8, latent_tokens=8,
                      codebook_size=64, latent_dim=4, transformer="S",
                      attn_impl="xla", dtype=jnp.float32)
    model = TiTok(cfg)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    tx = make_optimizer(1e-4, 1, 10, 1e-5, 0.0)
    state = TrainState.create(params, tx, ema_decay=0.9)
    ema = jax.tree.map(lambda p: p * 0.5, params)
    state = state.replace(ema_params=ema)
    ckpt = Checkpointer(str(tmp_path / "ckpt"), mode="min")
    ckpt.save_if_best(state, 1.0, config=cfg)
    ckpt.finalize()

    out = export_tokenizer(str(tmp_path / "ckpt"), str(tmp_path / "ema"),
                           bs=2, platforms=("cpu",), use_ema=True)
    served = load_exported(out)
    assert served["manifest"]["use_ema"] is True
    # the artifact's weights are the EMA tree, not the live params
    with np.load(out / "weights.npz") as npz:
        key = next(k for k in npz.files if k.endswith("qkv/kernel"))
        node_e, node_p = ema, params
        for part in key.split("/")[:-1]:
            node_e, node_p = node_e[part], node_p[part]
        np.testing.assert_allclose(npz[key], np.asarray(node_e["kernel"]),
                                   rtol=1e-6)
        assert not np.allclose(npz[key], np.asarray(node_p["kernel"]))

    # served output matches the live model applied with the EMA weights
    images = np.asarray(jax.random.uniform(jax.random.PRNGKey(0),
                                           (2, 32, 32, 3), jnp.float32))
    idx = np.asarray(served["encode"](images))
    live = np.asarray(model.apply({"params": ema}, jnp.asarray(images),
                                  method=model.encode))
    np.testing.assert_array_equal(idx, live)

    # a non-EMA checkpoint is rejected up front
    ckpt2 = Checkpointer(str(tmp_path / "ckpt2"), mode="min")
    ckpt2.save_if_best(TrainState.create(params, tx), 1.0, config=cfg)
    ckpt2.finalize()
    with pytest.raises(ValueError, match="no EMA"):
        export_tokenizer(str(tmp_path / "ckpt2"), str(tmp_path / "x"),
                         bs=2, platforms=("cpu",), use_ema=True)
