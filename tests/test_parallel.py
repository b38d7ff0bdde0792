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


@pytest.mark.parametrize("grad", [False, True])
def test_pjit_dropout_streams_global_unpacked(grad):
    """In-kernel dropout under pjit: batch AND head shards must reproduce the
    single-device mask streams exactly (kernels/attention.py dim_offset plumbing;
    VERDICT r2 weakness 3 — streams used to repeat across shards)."""
    from vit_tpu.kernels.attention import flash_attention

    mesh = make_mesh(dp=4, fsdp=1, tp=2)
    b, h, s, d = 8, 4, 40, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks)
    rng = jax.random.PRNGKey(3)

    def f(q, k, v):
        out = flash_attention(q, k, v, dropout_rate=0.3, dropout_rng=rng)
        return jnp.sum(out ** 2)

    fn = jax.grad(f, argnums=(0, 1, 2)) if grad else f
    ref = jax.jit(fn)(q, k, v)

    sh = NamedSharding(mesh, P("data", "model"))
    args = tuple(jax.device_put(x, sh) for x in (q, k, v))
    out = jax.jit(fn, in_shardings=(sh, sh, sh))(*args)

    for a, b_ in zip(jax.tree_util.tree_leaves(ref),
                     jax.tree_util.tree_leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("grad", [False, True])
def test_pjit_dropout_streams_global_packed(grad):
    """Same stream-globality contract for the packed-QKV kernel (batch shards)."""
    from vit_tpu.kernels.attention import flash_attention_packed, packed_supported

    mesh = make_mesh(dp=8, fsdp=1, tp=1)
    b, s, n_heads, n_embd = 8, 24, 2, 128
    assert packed_supported(n_heads, n_embd, s, 0.3)
    qkv = jax.random.normal(jax.random.PRNGKey(1), (b, s, 3 * n_embd),
                            jnp.float32)
    rng = jax.random.PRNGKey(5)

    def f(qkv):
        out = flash_attention_packed(qkv, n_heads, dropout_rate=0.3,
                                     dropout_rng=rng)
        return jnp.sum(out ** 2)

    fn = jax.grad(f) if grad else f
    ref = jax.jit(fn)(qkv)
    sh = NamedSharding(mesh, P("data"))
    out = jax.jit(fn, in_shardings=(sh,))(jax.device_put(qkv, sh))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)
