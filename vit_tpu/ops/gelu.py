"""GELU with a TPU-fast exact-erf approximation.

The reference MLP uses torch ``nn.GELU()`` — exact-erf semantics
(reference transformer.py:39). On this TPU, XLA lowers ``jax.lax.erf`` to a
rational approximation whose divide/exp chain SERIALIZES against the fc1
GEMM inside the matmul-epilogue fusion: the flagship's fc1 fusion measures
69 TF/s with exact erf vs 122 TF/s with a tanh-form epilogue — +0.6 ms per
call, ~9 ms/step across 24 MLPs (scripts/bench_fc1.py, round-5 table in
BENCHMARKS.md).

``tanh_erf`` (the default) computes erf through the VPU's cheap tanh:

    erf(u) ≈ tanh(u·(c1 + u²·(c3 + u²·c5))),   u clamped to [-4, 4]

with coefficients fitted by Nelder-Mead minimax on [0, 6] (this repo,
round 5): max |erf err| 3.7e-5, max |gelu err| 5.4e-5 — 70× below bf16's
resolution at |gelu| = 1 (2⁻⁸) and 10× more accurate than the classic
``approximate='tanh'`` gelu (3.6e-4). The clamp keeps the odd polynomial from
diverging outside the fit range (erf saturates to ±1 within 1.5e-8 by
|u| = 4). Gradients flow through the approximation itself (plain AD — tanh'
is again cheap), so optimization sees a consistent, smooth function.

Accuracy + saturation pinned by tests/test_gelu.py against jax.lax.erf.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_INV_SQRT2 = 0.7071067811865476
# minimax fit of erf(u) = tanh(c1·u + c3·u³ + c5·u⁵) on u ∈ [0, 6]
_C1, _C3, _C5 = 1.12814338, 0.10408119, -0.00178647


def tanh_erf(u):
    """erf via tanh-composed odd quintic (max err 3.7e-5 — see module doc)."""
    u = jnp.clip(u, -4.0, 4.0)
    u2 = u * u
    return jnp.tanh(u * (_C1 + u2 * (_C3 + u2 * _C5)))


@jax.custom_vjp
def _tanh_erf_gelu(x):
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + tanh_erf(xf * _INV_SQRT2))).astype(x.dtype)


def _tanh_erf_gelu_fwd(x):
    return _tanh_erf_gelu(x), x


def _tanh_erf_gelu_bwd(x, g):
    # Hand-written flat derivative of the forward (identical math to what AD
    # would produce — d/dx[0.5x(1+tanh(p(u)))] with u = clip(x/√2)):
    #   0.5(1+t) + 0.5·x·(1−t²)·p'(u)/√2,  t = tanh(p(u)).
    # Why custom: XLA schedules jax.vjp's generated graph for this at
    # 80 TF/s in the MLP backward fusion vs 124 TF/s for this flat form —
    # +0.42 ms per flagship MLP layer (scripts/bench_fc2bwd.py, round 5).
    # The clip means p' is evaluated on the clamped u; in the clamped region
    # t = ±1 to 1.6e-8 so (1−t²) kills the second term and the derivative is
    # exactly the saturated 0/1 — matching AD's clip-gradient semantics to
    # float rounding.
    xf = x.astype(jnp.float32)
    u = jnp.clip(xf * _INV_SQRT2, -4.0, 4.0)
    u2 = u * u
    p = u * (_C1 + u2 * (_C3 + u2 * _C5))
    t = jnp.tanh(p)
    dp = _C1 + u2 * (3 * _C3 + u2 * (5 * _C5))
    gp = 0.5 * (1.0 + t) + 0.5 * xf * (1.0 - t * t) * dp * _INV_SQRT2
    return ((g.astype(jnp.float32) * gp).astype(x.dtype),)


_tanh_erf_gelu.defvjp(_tanh_erf_gelu_fwd, _tanh_erf_gelu_bwd)


def gelu(x, impl: str | None = None):
    """GELU(x) = 0.5·x·(1 + erf(x/√2)) with a selectable erf path.

    impl: "tanh_erf" (default — fitted tanh-composed erf, bf16-exact),
    "erf" (jax.lax.erf, the strict-parity escape hatch), "tanh" (flax
    approximate gelu). None resolves $VIT_TPU_GELU then "tanh_erf".
    """
    impl = impl or os.environ.get("VIT_TPU_GELU") or "tanh_erf"
    if impl == "erf":
        return jax.nn.gelu(x, approximate=False)
    if impl == "tanh":
        return jax.nn.gelu(x, approximate=True)
    if impl != "tanh_erf":
        raise ValueError(f"unknown gelu impl {impl!r}")
    return _tanh_erf_gelu(x)
