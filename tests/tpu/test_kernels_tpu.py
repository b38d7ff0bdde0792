"""TPU-only kernel parity at production shapes (run manually on a real chip):

    JAX_PLATFORMS='' python -m pytest tests/tpu -q -p no:cacheprovider

The main suite (tests/) forces the CPU platform; these tests exercise the compiled
Pallas kernels on real hardware at the flagship model's shapes, including the odd
sequence lengths (257, 321) the padding path must handle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if jax.default_backend() != "tpu":  # pragma: no cover
    pytest.skip("requires a real TPU", allow_module_level=True)

from vit_tpu.kernels.attention import flash_attention
from vit_tpu.kernels.vq import nearest_code, nearest_code_xla
from vit_tpu.ops.attention import attention_xla


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("s", [257, 321, 1024])
def test_flash_attention_tpu_shapes(causal, s):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    shape = (4, 12, s, 64)
    q = jax.random.normal(k1, shape, jnp.float32)
    k = jax.random.normal(k2, shape, jnp.float32)
    v = jax.random.normal(k3, shape, jnp.float32)
    out = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=causal))(q, k, v)
    ref = attention_xla(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=2e-3)


def test_flash_attention_bf16_close_to_fp32():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    shape = (2, 12, 320, 64)
    q = jax.random.normal(k1, shape, jnp.float32)
    k = jax.random.normal(k2, shape, jnp.float32)
    v = jax.random.normal(k3, shape, jnp.float32)
    out_bf = flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                             v.astype(jnp.bfloat16))
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out_bf).astype(np.float32),
                               np.asarray(ref), atol=3e-2, rtol=3e-2)


def test_vq_kernel_tpu_flagship_shape():
    kz, kc = jax.random.split(jax.random.PRNGKey(2))
    z = jax.random.normal(kz, (32 * 256, 12), jnp.float32)
    cb = jax.random.normal(kc, (16384, 12), jnp.float32)
    got = jax.jit(lambda z, cb: nearest_code(z, cb, impl="pallas"))(z, cb)
    want = nearest_code_xla(z, cb)
    got_np, want_np = np.asarray(got), np.asarray(want)
    match = float(np.mean(got_np == want_np))
    assert match > 0.999, match
    # any disagreements must be genuine numerical near-ties: the two chosen codes
    # sit at (floating-point-)identical distance from z
    if match < 1.0:
        zn = np.asarray(z, np.float64)
        zn /= np.linalg.norm(zn, axis=-1, keepdims=True)
        cn = np.asarray(cb, np.float64)
        cn /= np.linalg.norm(cn, axis=-1, keepdims=True)
        bad = np.nonzero(got_np != want_np)[0]
        d_got = np.sum((zn[bad] - cn[got_np[bad]]) ** 2, -1)
        d_want = np.sum((zn[bad] - cn[want_np[bad]]) ** 2, -1)
        np.testing.assert_allclose(d_got, d_want, atol=1e-5)
