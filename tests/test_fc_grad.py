"""Parity tests for the fused dW+db linear backward (kernels/fc_grad.py).

CPU runs the kernel in interpret mode; the same code compiles on TPU
(tests/tpu/test_fc_grad_tpu.py exercises compiled production shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.kernels.fc_grad import fused_dense, matmul_dw_db, supported


@pytest.mark.parametrize("n", [256, 300])   # 300: ragged final row block
@pytest.mark.parametrize("db_operand", [0, 1])
def test_matmul_dw_db_matches_xla(n, db_operand):
    key = jax.random.PRNGKey(0)
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (n, 128), jnp.float32)
    b = jax.random.normal(kb, (n, 384), jnp.float32)
    dw, db = matmul_dw_db(a, b, db_operand=db_operand)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(a.T @ b),
                               rtol=1e-5, atol=1e-4)
    ref = (a if db_operand == 0 else b).sum(axis=0)
    np.testing.assert_allclose(np.asarray(db), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_matmul_dw_db_bf16_inputs():
    key = jax.random.PRNGKey(1)
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (512, 256), jnp.float32).astype(jnp.bfloat16)
    b = jax.random.normal(kb, (512, 128), jnp.float32).astype(jnp.bfloat16)
    dw, db = matmul_dw_db(a, b)
    ref = np.asarray(a.T.astype(jnp.float32) @ b.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(dw), ref, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(db), np.asarray(b.astype(jnp.float32).sum(0)),
        rtol=2e-2, atol=2e-2)


def test_supported_gates():
    assert supported(768, 3072)
    assert supported(1024, 4096)
    assert not supported(768, 3000)   # not lane-aligned
    assert not supported(769, 3072)


@pytest.mark.parametrize("cin,cout", [(128, 512), (512, 128)])  # fc1/fc2 paths
def test_fused_dense_grads_match_xla(cin, cout):
    key = jax.random.PRNGKey(2)
    kx, kw, kg = jax.random.split(key, 3)
    x = jax.random.normal(kx, (2, 40, cin), jnp.float32)
    w = jax.random.normal(kw, (cin, cout), jnp.float32) * 0.02
    b = jnp.zeros((cout,), jnp.float32)

    def loss_fused(w, b, x):
        return jnp.sum(fused_dense(x, w, b) ** 2)

    def loss_ref(w, b, x):
        return jnp.sum((jnp.dot(x, w) + b) ** 2)

    out_f = fused_dense(x, w, b)
    np.testing.assert_allclose(np.asarray(out_f),
                               np.asarray(jnp.dot(x, w) + b),
                               rtol=1e-6, atol=1e-6)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(w, b, x)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(w, b, x)
    for got, ref, name in zip(gf, gr, ("dW", "db", "dx")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_mlp_fused_fc_matches_default(monkeypatch):
    """Transformer forward+grads identical (fp32) with the fused fc backward
    forced on vs off — same param tree, same math."""
    from vit_tpu.core.config import TransformerConfig
    from vit_tpu.core.transformer import Transformer

    cfg = TransformerConfig(n_layers=2, n_heads=2, n_embd=128, block_size=24,
                            dtype=jnp.float32, attn_impl="xla")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 128), jnp.float32)

    def run():
        model = Transformer(cfg)
        params = model.init(jax.random.PRNGKey(1), x)["params"]

        def loss(p):
            return jnp.mean(model.apply({"params": p}, x) ** 2)

        val, grads = jax.value_and_grad(loss)(params)
        return val, grads, params

    monkeypatch.setenv("VIT_TPU_FUSED_FC", "0")
    v0, g0, p0 = run()
    monkeypatch.setenv("VIT_TPU_FUSED_FC", "1")
    v1, g1, p1 = run()

    assert jax.tree.structure(p0) == jax.tree.structure(p1)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_flatten_with_path(g1)[0])
    for path, leaf in flat0:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat1[path]), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path))


def test_fused_fc_pjit_matches_single_device(monkeypatch):
    """Data-sharded fused_dense grads equal the single-device result (the
    custom_partitioning lower psums per-shard dW/db over the batch axes)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    monkeypatch.setenv("VIT_TPU_FUSED_FC", "1")
    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs).reshape(4), ("data",))
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 256), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(2), (256,), jnp.float32)

    def loss(w, b, x):
        return jnp.sum(fused_dense(x, w, b) ** 2)

    ref = jax.grad(loss, argnums=(0, 1))(w, b, x)
    with mesh:
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ws = jax.device_put(w, NamedSharding(mesh, P()))
        bs = jax.device_put(b, NamedSharding(mesh, P()))
        got = jax.jit(jax.grad(loss, argnums=(0, 1)))(ws, bs, xs)
    for g, r, name in zip(got, ref, ("dW", "db")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-3, err_msg=name)


def test_mlp_fused_fc_under_remat(monkeypatch):
    """fused_dense composes with jax.checkpoint (cfg.remat): same grads."""
    from vit_tpu.core.config import TransformerConfig
    from vit_tpu.core.transformer import Transformer

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 128), jnp.float32)

    def grads(remat, fused):
        monkeypatch.setenv("VIT_TPU_FUSED_FC", "1" if fused else "0")
        cfg = TransformerConfig(n_layers=1, n_heads=2, n_embd=128,
                                block_size=16, dtype=jnp.float32,
                                attn_impl="xla", remat=remat)
        model = Transformer(cfg)
        params = model.init(jax.random.PRNGKey(1), x)["params"]
        return jax.grad(
            lambda p: jnp.mean(model.apply({"params": p}, x) ** 2))(params)

    ref = grads(remat=False, fused=False)
    got = grads(remat=True, fused=True)
    for path, leaf in jax.tree_util.tree_leaves_with_path(ref):
        other = dict(jax.tree_util.tree_flatten_with_path(got)[0])[path]
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(other),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=jax.tree_util.keystr(path))
