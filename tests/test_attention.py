"""Attention parity: XLA reference vs torch SDPA, Pallas kernel vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vit_tpu.kernels.attention import flash_attention
from vit_tpu.ops.attention import attention_xla

TOL = 1e-3


def _rand_qkv(key, b=2, h=4, s=37, d=16, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    shape = (b, h, s, d)
    return (jax.random.normal(kq, shape, dtype),
            jax.random.normal(kk, shape, dtype),
            jax.random.normal(kv, shape, dtype))


@pytest.mark.parametrize("causal", [False, True])
def test_xla_matches_torch_sdpa(causal):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0))
    out = attention_xla(q, k, v, causal=causal)
    tq, tk, tv = (torch.from_numpy(np.asarray(x)) for x in (q, k, v))
    ref = torch.nn.functional.scaled_dot_product_attention(
        tq, tk, tv, is_causal=causal).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=TOL, rtol=TOL)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("s", [64, 37])
def test_pallas_matches_xla(causal, s):
    # (On CPU this runs the kernel in interpret mode; larger/odd shapes like 257/321
    # are exercised on real TPU by tests/tpu/test_kernels_tpu.py and bench.py.)
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), b=1, h=2, s=s, d=64)
    out = flash_attention(q, k, v, causal=causal)
    ref = attention_xla(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=TOL, rtol=TOL)


def test_pallas_grad_matches_xla():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), b=1, h=2, s=48, d=64)

    def loss_pallas(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(attention_xla(q, k, v, causal=True) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=TOL, rtol=TOL)


def test_dropout_attention_runs_and_is_stochastic():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), s=16, d=8)
    rng = jax.random.PRNGKey(42)
    out1 = attention_xla(q, k, v, dropout_rate=0.5, dropout_rng=rng)
    out2 = attention_xla(q, k, v, dropout_rate=0.5,
                         dropout_rng=jax.random.PRNGKey(43))
    assert out1.shape == q.shape
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


class TestInKernelDropout:
    """Fused in-kernel attention dropout (pallas path)."""

    def _qkv(self, s=24, d=8):
        return _rand_qkv(jax.random.PRNGKey(5), b=1, h=2, s=s, d=d)

    def test_deterministic_per_key_and_stochastic_across_keys(self):
        q, k, v = self._qkv()
        rng = jax.random.PRNGKey(0)
        f = lambda r: flash_attention(q, k, v, dropout_rate=0.3, dropout_rng=r)
        a1, a2 = f(rng), f(rng)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        b = f(jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(a1), np.asarray(b))

    def test_unbiased_in_expectation(self):
        q, k, v = self._qkv()
        base = flash_attention(q, k, v)
        outs = [np.asarray(flash_attention(q, k, v, dropout_rate=0.3,
                                           dropout_rng=jax.random.PRNGKey(i)))
                for i in range(64)]
        mean = np.mean(outs, axis=0)
        err = np.abs(mean - np.asarray(base)).mean()
        scale = np.abs(np.asarray(base)).mean()
        assert err < 0.15 * scale, (err, scale)

    def test_gradient_matches_finite_differences(self):
        q, k, v = self._qkv(s=10, d=8)
        rng = jax.random.PRNGKey(3)

        def loss(q_, k_, v_):
            out = flash_attention(q_, k_, v_, causal=True, dropout_rate=0.25,
                                  dropout_rng=rng)
            return jnp.sum(out * jnp.cos(out * 0.1))

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        eps = 1e-3
        rng2 = np.random.default_rng(0)
        for argi, (arr, grad) in enumerate(zip((q, k, v), g)):
            for _ in range(4):
                idx = tuple(rng2.integers(0, s) for s in arr.shape)
                delta = np.zeros(arr.shape, np.float32)
                delta[idx] = eps
                args_p = [q, k, v]
                args_m = [q, k, v]
                args_p[argi] = arr + delta
                args_m[argi] = arr - delta
                fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
                np.testing.assert_allclose(float(np.asarray(grad)[idx]), fd,
                                           atol=2e-2, rtol=2e-2)


# ---------------- packed-QKV path (round 2: zero-glue head split) ----------------

def _unpack_ref(qkv, n_heads, **kw):
    b, s, td = qkv.shape
    d = td // 3 // n_heads
    q, k, v = qkv.reshape(b, s, 3, n_heads, d).transpose(2, 0, 3, 1, 4)
    out = attention_xla(q, k, v, **kw)
    return out.transpose(0, 2, 1, 3).reshape(b, s, td // 3)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("s", [64, 37])
def test_packed_matches_unpacked_xla(causal, s):
    from vit_tpu.kernels.attention import flash_attention_packed, packed_supported

    n_heads, n_embd = 4, 256  # head_dim 64, n_embd % 128 == 0
    assert packed_supported(n_heads, n_embd, s)
    qkv = jax.random.normal(jax.random.PRNGKey(7), (2, s, 3 * n_embd))
    out = flash_attention_packed(qkv, n_heads, causal=causal)
    ref = _unpack_ref(qkv, n_heads, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=TOL, rtol=TOL)


@pytest.mark.parametrize("causal", [False, True])
def test_packed_grad_matches_unpacked_xla(causal):
    from vit_tpu.kernels.attention import flash_attention_packed

    n_heads = 2
    qkv = jax.random.normal(jax.random.PRNGKey(8), (1, 40, 3 * 128))

    g1 = jax.grad(lambda x: jnp.sum(
        flash_attention_packed(x, n_heads, causal=causal) ** 2))(qkv)
    g2 = jax.grad(lambda x: jnp.sum(
        _unpack_ref(x, n_heads, causal=causal) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=TOL, rtol=TOL)


def test_packed_dropout_keep_rate_and_grad_consistency():
    from vit_tpu.kernels.attention import flash_attention_packed

    n_heads, s, rate = 2, 64, 0.3
    rng = jax.random.PRNGKey(9)
    qkv = jax.random.normal(rng, (2, s, 3 * 128))
    # identity-ish v so dropped entries are visible: run twice, same rng → identical
    o1 = flash_attention_packed(qkv, n_heads, dropout_rate=rate, dropout_rng=rng)
    o2 = flash_attention_packed(qkv, n_heads, dropout_rate=rate, dropout_rng=rng)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = flash_attention_packed(qkv, n_heads, dropout_rate=rate,
                                dropout_rng=jax.random.PRNGKey(10))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    # grad must regenerate the same in-kernel mask: E over many keys ≈ no-dropout grad
    g = jax.grad(lambda x: jnp.sum(
        flash_attention_packed(x, n_heads, dropout_rate=rate,
                               dropout_rng=rng)))(qkv)
    assert np.all(np.isfinite(np.asarray(g)))


def test_fused_qkv_attention_fallback_matches():
    """The ops-level wrapper: pallas-ineligible shapes route through unpack."""
    from vit_tpu.ops.attention import fused_qkv_attention

    qkv = jax.random.normal(jax.random.PRNGKey(11), (2, 19, 3 * 96))  # head_dim 48
    out = fused_qkv_attention(qkv, 2, causal=True, impl="xla")
    ref = _unpack_ref(qkv, 2, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=TOL, rtol=TOL)


@pytest.mark.parametrize("causal", [False, True])
def test_packed_biased_matches_add_then_attend(causal):
    """qkv_bias path: in-kernel bias add ≡ adding the bias before the kernel,
    and the kernel-emitted bias gradient ≡ autodiff through the explicit add."""
    from vit_tpu.kernels.attention import flash_attention_packed

    n_heads = 2
    rng = jax.random.PRNGKey(12)
    qkv_nb = jax.random.normal(rng, (4, 40, 3 * 128))  # bb=2 sub-blocks
    bias = jax.random.normal(jax.random.PRNGKey(13), (3 * 128,)) * 0.3

    out = flash_attention_packed(qkv_nb, n_heads, causal=causal,
                                 qkv_bias=bias)
    ref = flash_attention_packed(qkv_nb + bias, n_heads, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=TOL,
                               rtol=TOL)

    def loss_kernel(x, b):
        return jnp.sum(flash_attention_packed(x, n_heads, causal=causal,
                                              qkv_bias=b) ** 2)

    def loss_ref(x, b):
        return jnp.sum(flash_attention_packed(x + b, n_heads,
                                              causal=causal) ** 2)

    gx1, gb1 = jax.grad(loss_kernel, argnums=(0, 1))(qkv_nb, bias)
    gx2, gb2 = jax.grad(loss_ref, argnums=(0, 1))(qkv_nb, bias)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=TOL,
                               rtol=TOL)
    np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2), atol=1e-4,
                               rtol=1e-4)


def test_packed_biased_odd_batch_bb1():
    """Odd batch falls back to bb=1; db accumulation must still be exact."""
    from vit_tpu.kernels.attention import flash_attention_packed

    qkv_nb = jax.random.normal(jax.random.PRNGKey(14), (3, 24, 3 * 128))
    bias = jax.random.normal(jax.random.PRNGKey(15), (3 * 128,)) * 0.1
    gb1 = jax.grad(lambda b: jnp.sum(flash_attention_packed(
        qkv_nb, 2, qkv_bias=b) ** 2))(bias)
    gb2 = jax.grad(lambda b: jnp.sum(flash_attention_packed(
        qkv_nb + b, 2) ** 2))(bias)
    np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2), atol=1e-4,
                               rtol=1e-4)


@pytest.mark.parametrize("s", [96, 640])
def test_packed_dropout_matches_explicit_mask_reference(s):
    """In-kernel dropout ≡ masked-softmax reference built from the SAME counter
    stream, for forward AND gradients — including q-block-tiled forwards
    (S=640 > 512: two q blocks in fwd, one full-sequence bwd program), which
    requires the mask hash to use global row coordinates."""
    import jax.numpy as jnp

    from vit_tpu.kernels.attention import (_dropout_mask,
                                           flash_attention_packed,
                                           packed_supported)

    n_heads, rate = 2, 0.25
    assert packed_supported(n_heads, 128, s, rate)
    rng = jax.random.PRNGKey(21)
    qkv = jax.random.normal(rng, (2, s, 3 * 128))
    seed = jax.random.randint(rng, (1,), 0, 2 ** 31 - 1, jnp.int32)

    def ref(x):
        b, _, td = x.shape
        d = td // 3 // n_heads
        q, k, v = x.reshape(b, s, 3, n_heads, d).transpose(2, 0, 3, 1, 4)
        sc = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(1.0 * d)
        p = jax.nn.softmax(sc, axis=-1)
        masks = jnp.stack([
            jnp.stack([_dropout_mask(seed, jnp.uint32(bi * n_heads + h),
                                     (s, s), rate) for h in range(n_heads)])
            for bi in range(b)])
        p = p * masks
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        return o.transpose(0, 2, 1, 3).reshape(b, s, td // 3)

    def kern(x):
        # same seed the public wrapper would derive — call the private op
        from vit_tpu.kernels.attention import _flash_attention_packed
        return _flash_attention_packed(x, seed, n_heads, False, rate)

    out_k, out_r = kern(qkv), ref(qkv)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=TOL, rtol=TOL)
    gk = jax.grad(lambda x: jnp.sum(kern(x) ** 2))(qkv)
    gr = jax.grad(lambda x: jnp.sum(ref(x) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=5e-3, rtol=5e-3)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("s", [1024, 1000])
def test_tiled_bwd_grad_matches_xla(causal, s):
    """S > _MAX_FUSED_BWD_SEQ routes to the q-block-tiled Pallas backward with
    per-program dk/dv partials (VideoGPT's default S=1024 context,
    reference train_videogpt.py:26-27). Gradients must match the XLA reference;
    s=1000 additionally exercises padded tail rows/columns."""
    from vit_tpu.kernels.attention import _tiled_bwd_blocking

    assert _tiled_bwd_blocking(s, False) is not None
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), b=1, h=2, s=s, d=64)

    def loss_pallas(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(attention_xla(q, k, v, causal=causal) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=TOL,
                                   rtol=TOL)


def test_tiled_bwd_dropout_grad_matches_explicit_mask():
    """Dropout at S > 768 keeps the fused path end-to-end: tiled-backward grads
    must match an explicit-mask XLA reference built from the SAME in-kernel
    mask stream (global (row,col) hash — block sizes don't matter)."""
    from vit_tpu.kernels.attention import (_dropout_mask, _MAX_FUSED_BWD_SEQ,
                                           _seed_vec)

    s, rate = 800, 0.25
    assert s > _MAX_FUSED_BWD_SEQ
    b, h, d = 1, 2, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), b=b, h=h, s=s, d=d)
    rng = jax.random.PRNGKey(9)
    seed = jax.random.randint(rng, (1,), 0, 2 ** 31 - 1, jnp.int32)
    seed_vec = _seed_vec(seed, 0)

    def loss_pallas(q, k, v):
        out = flash_attention(q, k, v, causal=False, dropout_rate=rate,
                              dropout_rng=rng)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        scale = 1.0 / np.sqrt(d)
        sc = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(sc, axis=-1)
        masks = jnp.stack([_dropout_mask(seed_vec, jnp.uint32(i), (s, s), rate,
                                         stride=s)
                           for i in range(b * h)]).reshape(b, h, s, s)
        out = jnp.einsum("bhqk,bhkd->bhqd", (p * masks).astype(v.dtype), v)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-3,
                                   rtol=2e-3)


def test_packed_stats_residuals_bitexact(monkeypatch):
    """(m, l)-residual backward (round 5) is BIT-exact vs the recompute path:
    the bwd rebuilds identical scores, so the saved row stats equal the
    recomputed ones value-for-value — gradients must match exactly, with and
    without a qkv bias, dense and causal."""
    from vit_tpu.kernels import attention as A

    n_heads = 2
    qkv = jax.random.normal(jax.random.PRNGKey(9), (2, 40, 3 * 128))
    bias = jax.random.normal(jax.random.PRNGKey(10), (3 * 128,)) * 0.1

    for causal in (False, True):
        for use_bias in (False, True):
            def loss(x):
                kw = dict(causal=causal)
                if use_bias:
                    kw["qkv_bias"] = bias
                return jnp.sum(A.flash_attention_packed(x, n_heads, **kw) ** 2)

            monkeypatch.setenv("VIT_TPU_ATTN_STATS", "1")
            g_stats = jax.grad(loss)(qkv)
            monkeypatch.setenv("VIT_TPU_ATTN_STATS", "0")
            g_plain = jax.grad(loss)(qkv)
            np.testing.assert_array_equal(np.asarray(g_stats),
                                          np.asarray(g_plain))
