"""TPU-only: compiled fused ConvNeXt block-tail parity at production shapes.

The CPU suite (tests/test_convnext_block.py) validates the kernel in interpret mode;
this exercises the Mosaic-compiled path at the perceptual net's real stage shapes
(bs 64 at 224² input: stage0 56²·96, stage2 14²·384), bf16 like the flagship step.

    JAX_PLATFORMS='' python -m pytest tests/tpu -q -p no:cacheprovider
"""

import jax
import jax.numpy as jnp
import pytest

if jax.default_backend() != "tpu":  # pragma: no cover
    pytest.skip("requires a real TPU", allow_module_level=True)

from vit_tpu.losses.perceptual import ConvNeXtBlock


@pytest.mark.parametrize("c,n_sp", [(96, 56), (384, 14)])
def test_fused_block_tpu_parity(c, n_sp):
    x = jax.random.normal(jax.random.PRNGKey(0), (8, n_sp, n_sp, c),
                          jnp.float32).astype(jnp.bfloat16)
    ref_blk = ConvNeXtBlock(c, dtype=jnp.bfloat16, mlp_impl="xla")
    fused_blk = ConvNeXtBlock(c, dtype=jnp.bfloat16, mlp_impl="fused")
    params = ref_blk.init(jax.random.PRNGKey(1), x)["params"]

    def make(blk):
        def f(xx):
            y = blk.apply({"params": params}, xx).astype(jnp.float32)
            return jnp.sum(jnp.sin(y)), y
        return jax.jit(jax.value_and_grad(f, has_aux=True))

    (vr, yr), gr = make(ref_blk)(x)
    (vf, yf), gf = make(fused_blk)(x)
    scale_y = float(jnp.max(jnp.abs(yr))) + 1e-8
    assert float(jnp.max(jnp.abs(yf - yr))) / scale_y < 0.03
    scale_g = float(jnp.max(jnp.abs(gr))) + 1e-8
    assert float(jnp.max(jnp.abs(gf.astype(jnp.float32)
                                 - gr.astype(jnp.float32)))) / scale_g < 0.05
