"""ops/gelu.py: the TPU-fast exact-erf GELU approximation.

Pins (a) accuracy of the fitted tanh-composed erf against jax.lax.erf — the
independent oracle, no twin — (b) saturation safety outside the fit range
(the clamp; an unclamped odd quintic DIVERGES for |u| > 6), (c) gradient
accuracy, (d) that the MLP's default path uses it and the "erf" escape hatch
restores bit-exact jax.nn.gelu."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.ops.gelu import gelu, tanh_erf


def test_tanh_erf_accuracy_vs_lax_erf():
    u = jnp.linspace(-8.0, 8.0, 40001, dtype=jnp.float32)
    err = np.abs(np.asarray(tanh_erf(u)) - np.asarray(jax.lax.erf(u)))
    assert err.max() < 5e-5, err.max()


def test_gelu_accuracy_and_saturation():
    x = jnp.linspace(-30.0, 30.0, 60001, dtype=jnp.float32)
    got = np.asarray(gelu(x, "tanh_erf"))
    want = np.asarray(jax.nn.gelu(x, approximate=False))
    assert np.abs(got - want).max() < 1e-4          # fit region
    # far tails: gelu(x)→x for large x, →0 for very negative x — the clamp
    # keeps the polynomial from diverging (tanh(p(9)) would be NEGATIVE)
    assert np.allclose(got[x > 6], np.asarray(x[x > 6]), atol=1e-4)
    assert np.all(np.abs(got[x < -6]) < 1e-6)
    # 10x better than the classic tanh gelu everywhere
    classic = np.asarray(jax.nn.gelu(x, approximate=True))
    assert np.abs(got - want).max() < np.abs(classic - want).max() / 3


def test_gelu_bf16_indistinguishable():
    """At bf16 output resolution the approximation is within ONE bf16 ulp of
    the exact value everywhere (the 5.4e-5 max error only matters at rounding
    ties) and bit-equal for the large majority of inputs."""
    x = jnp.linspace(-6.0, 6.0, 20001, dtype=jnp.float32).astype(jnp.bfloat16)
    got = np.asarray(gelu(x, "tanh_erf").astype(jnp.float32))
    want = np.asarray(jax.nn.gelu(x.astype(jnp.float32),
                                  approximate=False).astype(jnp.bfloat16)
                      .astype(jnp.float32))
    # true bf16 spacing at |want|: 2^(exponent - 7) (8-bit mantissa incl. hidden)
    with np.errstate(divide="ignore"):
        ulp = np.where(want == 0.0, 2.0 ** -14,
                       2.0 ** (np.floor(np.log2(np.maximum(np.abs(want),
                                                           1e-30))) - 7))
    # within 1 ulp wherever the value is representable; in the deep negative
    # tail (|gelu| < ~1e-3, many ulps of a vanishing number) the absolute
    # error bound 1e-4 governs instead
    assert np.all((np.abs(got - want) <= ulp + 1e-12)
                  | (np.abs(got - want) < 1e-4)), np.abs(got - want).max()
    assert (got == want).mean() > 0.65


def test_gelu_gradient_accuracy():
    x = jnp.linspace(-8.0, 8.0, 20001, dtype=jnp.float32)
    g_got = np.asarray(jax.vmap(jax.grad(lambda v: gelu(v, "tanh_erf")))(x))
    g_want = np.asarray(jax.vmap(jax.grad(
        lambda v: jax.nn.gelu(v, approximate=False)))(x))
    assert np.abs(g_got - g_want).max() < 5e-4


def test_escape_hatch_and_env(monkeypatch):
    x = jnp.linspace(-3.0, 3.0, 101, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(gelu(x, "erf")),
                                  np.asarray(jax.nn.gelu(x, approximate=False)))
    np.testing.assert_array_equal(np.asarray(gelu(x, "tanh")),
                                  np.asarray(jax.nn.gelu(x, approximate=True)))
    monkeypatch.setenv("VIT_TPU_GELU", "erf")
    np.testing.assert_array_equal(np.asarray(gelu(x)),
                                  np.asarray(jax.nn.gelu(x, approximate=False)))


def test_mlp_uses_config_impl():
    """gelu_impl threads through the transformer MLP: 'erf' reproduces the
    old exact path bit-for-bit; the default differs from exact by < 1e-4."""
    from vit_tpu.core.config import S
    from vit_tpu.core.transformer import Mlp

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 512), jnp.float32)
    outs = {}
    for impl in ("erf", "tanh_erf"):
        cfg = S(block_size=8, dtype=jnp.float32, gelu_impl=impl)
        m = Mlp(cfg)
        params = m.init(jax.random.PRNGKey(1), x)["params"]
        outs[impl] = np.asarray(m.apply({"params": params}, x))
    assert not np.array_equal(outs["erf"], outs["tanh_erf"])
    assert np.abs(outs["erf"] - outs["tanh_erf"]).max() < 1e-3
