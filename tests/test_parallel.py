"""Multi-chip sharding on the 8-virtual-device CPU mesh (the JAX-native fake backend):
sharded training must match single-device numerics, and params must actually shard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vit_tpu.models.titok import TiTok, TiTokConfig
from vit_tpu.parallel.mesh import batch_sharding, make_mesh
from vit_tpu.parallel.sharding import params_shardings, state_shardings
from vit_tpu.train.optim import make_optimizer
from vit_tpu.train.state import TrainState
from vit_tpu.train.step import make_tokenizer_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def tiny_model():
    cfg = TiTokConfig(image_size=16, patch_size=4, latent_tokens=8, codebook_size=32,
                      latent_dim=6, transformer="S", dtype=jnp.float32,
                      attn_impl="xla")
    for name in ("enc_vit_config", "dec_vit_config"):
        sub = getattr(cfg, name)
        sub.trans_config = sub.trans_config.replace(n_layers=2, n_heads=4, n_embd=32)
    cfg.n_embd = 32
    return TiTok(cfg), cfg


def _make_state(model, images):
    params = model.init(jax.random.PRNGKey(1), images)["params"]
    tx = make_optimizer(1e-3, 2, 100, 1e-4, 1e-4, clip_norm=1.0)
    return TrainState.create(params, tx)


def test_mesh_shapes():
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    assert mesh.shape == {"data": 2, "fsdp": 2, "model": 2}
    mesh2 = make_mesh(fsdp=1, tp=4)
    assert mesh2.shape == {"data": 2, "fsdp": 1, "model": 4}


def test_param_shardings_shard_the_big_kernels():
    model, cfg = tiny_model()
    images = jnp.zeros((8, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), images)["params"]
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    sh = params_shardings(mesh, params)
    qkv = sh["enc"]["vit"]["transformer"]["layer_0"]["attn"]["qkv"]["kernel"]
    assert qkv.spec == P("fsdp", "model")
    fc2 = sh["enc"]["vit"]["transformer"]["layer_0"]["mlp"]["fc2"]["kernel"]
    assert fc2.spec == P("model", "fsdp")
    assert sh["quant"]["codebook"].spec == P()


@pytest.mark.parametrize("mesh_kw", [dict(dp=8, fsdp=1, tp=1),
                                     dict(dp=2, fsdp=2, tp=2)])
def test_sharded_step_matches_single_device(mesh_kw):
    model, cfg = tiny_model()
    images = jax.random.uniform(jax.random.PRNGKey(0), (8, 16, 16, 3))
    usage = jnp.zeros((cfg.codebook_size,), jnp.float32)
    rng = jax.random.PRNGKey(7)
    step_fn = make_tokenizer_train_step(model)

    # single device
    state1 = _make_state(model, images)
    s1, u1, m1, _ = jax.jit(step_fn)(state1, images, usage, rng)

    # sharded
    mesh = make_mesh(**mesh_kw)
    state2 = _make_state(model, images)
    st_sh = state_shardings(mesh, state2)
    b_sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    state2 = jax.device_put(state2, st_sh)
    images_s = jax.device_put(images, b_sh)
    usage_s = jax.device_put(usage, rep)
    sharded = jax.jit(step_fn, in_shardings=(st_sh, b_sh, rep, rep),
                      out_shardings=(st_sh, rep, rep, b_sh))
    with mesh:
        s2, u2, m2, _ = sharded(state2, images_s, usage_s, rng)

    np.testing.assert_allclose(float(m1["train/loss"]), float(m2["train/loss"]),
                               rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    # parameters after one update agree
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(jax.device_get(s2.params))
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_params_physically_sharded():
    model, cfg = tiny_model()
    images = jnp.zeros((8, 16, 16, 3))
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    state = _make_state(model, images)
    state = jax.device_put(state, state_shardings(mesh, state))
    qkv = state.params["enc"]["vit"]["transformer"]["layer_0"]["attn"]["qkv"]["kernel"]
    # (32, 96) sharded ("fsdp","model") → each device holds (16, 48)
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(16, 48)}


@pytest.mark.parametrize("attn_impl", ["xla", "pallas"])
def test_shard_map_dp_step_matches_single_device(attn_impl):
    """Pallas-kernels-per-shard DP step (parallel/shard_step.py): numerics must match
    the single-device step — including with the Pallas attention kernel running on
    each local shard (the composition plain GSPMD can't partition)."""
    from vit_tpu.parallel.shard_step import make_dp_tokenizer_train_step
    from jax.sharding import Mesh

    model, cfg = tiny_model()
    for name in ("enc_vit_config", "dec_vit_config"):
        sub = getattr(cfg, name)
        sub.trans_config = sub.trans_config.replace(attn_impl=attn_impl)
    images = jax.random.uniform(jax.random.PRNGKey(0), (8, 16, 16, 3))
    usage = jnp.zeros((cfg.codebook_size,), jnp.float32)
    rng = jax.random.PRNGKey(7)

    state1 = _make_state(model, images)
    s1, u1, m1, _ = jax.jit(make_tokenizer_train_step(model))(
        state1, images, usage, rng)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    step = make_dp_tokenizer_train_step(model, mesh)
    state2 = _make_state(model, images)
    with mesh:
        s2, u2, m2, _ = step(state2, images, usage, rng)

    np.testing.assert_allclose(float(m1["train/loss"]), float(m2["train/loss"]),
                               rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_pjit_keeps_pallas_kernels(capfd):
    """Round-2: custom_partitioning rules let the dp×fsdp×tp pjit path keep the
    fused Pallas attention (packed) + VQ kernels on local shards — numerics must
    match the single-device step (round 1 had to force attn_impl="xla" here)."""
    cfg = TiTokConfig(image_size=16, patch_size=4, latent_tokens=8,
                      codebook_size=32, latent_dim=6, transformer="S",
                      dtype=jnp.float32, attn_impl="pallas")
    for name in ("enc_vit_config", "dec_vit_config"):
        sub = getattr(cfg, name)
        sub.trans_config = sub.trans_config.replace(
            n_layers=2, n_heads=2, n_embd=128, attn_impl="pallas")
    cfg.n_embd = 128
    model = TiTok(cfg)

    images = jax.random.uniform(jax.random.PRNGKey(0), (8, 16, 16, 3))
    usage = jnp.zeros((cfg.codebook_size,), jnp.float32)
    rng = jax.random.PRNGKey(7)
    step_fn = make_tokenizer_train_step(model)

    state1 = _make_state(model, images)
    s1, u1, m1, _ = jax.jit(step_fn)(state1, images, usage, rng)

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    state2 = _make_state(model, images)
    st_sh = state_shardings(mesh, state2)
    b_sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    state2 = jax.device_put(state2, st_sh)
    sharded = jax.jit(step_fn, in_shardings=(st_sh, b_sh, rep, rep),
                      out_shardings=(st_sh, rep, rep, b_sh))
    with mesh:
        s2, u2, m2, _ = sharded(state2, jax.device_put(images, b_sh),
                                jax.device_put(usage, rep), rng)

    np.testing.assert_allclose(float(m1["train/loss"]), float(m2["train/loss"]),
                               rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
