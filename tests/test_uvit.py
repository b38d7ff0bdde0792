"""U-ViT blocks: DropPath semantics, UViTBlock shapes/skip/remat."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.core.uvit import DropPath, Mlp, UViTBlock


def test_drop_path_eval_identity_and_train_scaling():
    dp = DropPath(rate=0.5)
    x = jnp.ones((64, 4, 8))
    params = dp.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)}, x, False)
    out_eval = dp.apply(params, x, True)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))
    out_train = dp.apply(params, x, False, rngs={"dropout": jax.random.PRNGKey(2)})
    arr = np.asarray(out_train)
    # whole samples either dropped (0) or scaled by 1/keep (2.0)
    per_sample = arr.reshape(64, -1)
    assert set(np.unique(per_sample.max(axis=1))) <= {0.0, 2.0}
    assert (per_sample.max(axis=1) == per_sample.min(axis=1)).all()
    # unbiased in expectation (loose check)
    assert 0.6 < arr.mean() < 1.4


def test_uvit_block_shapes_and_skip():
    block = UViTBlock(dim=32, num_heads=4, skip=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32))
    s = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 32))
    params = block.init(jax.random.PRNGKey(2), x, s)
    out = block.apply(params, x, s)
    assert out.shape == (2, 9, 32)
    out2 = block.apply(params, x, jnp.zeros_like(s))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_uvit_block_remat_matches():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32))
    b1 = UViTBlock(dim=32, num_heads=4, use_checkpoint=False)
    b2 = UViTBlock(dim=32, num_heads=4, use_checkpoint=True)
    params = b1.init(jax.random.PRNGKey(1), x)
    o1 = b1.apply(params, x)
    o2 = b2.apply(params, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    g1 = jax.grad(lambda p: jnp.sum(b1.apply(p, x) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(b2.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mlp():
    mlp = Mlp(hidden_features=64, out_features=16)
    x = jnp.ones((2, 5, 16))
    params = mlp.init(jax.random.PRNGKey(0), x)
    assert mlp.apply(params, x).shape == (2, 5, 16)
