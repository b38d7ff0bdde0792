"""Multi-head attention ops: XLA reference implementation + Pallas dispatch.

Functional equivalent of ``F.scaled_dot_product_attention`` as used by the reference
(transformer.py:28, blocks.py:102): softmax(q·kᵀ/√d [+ causal mask]) · v, with optional
dropout on the attention probabilities.

Two implementations:
  - ``xla``:    pure jnp; XLA fuses the softmax chain. Used on CPU, for dropout>0, and
                as the numerical oracle in kernel parity tests.
  - ``pallas``: fused TPU kernel (vit_tpu/kernels/attention.py) that never materializes
                the (B,H,S,S) score matrix in HBM.

Layout is (B, H, S, D) throughout ("BHSD"), the same math as the reference's
``rearrange(qkv, "b n (qkv h d) -> qkv b h n d")`` layout (transformer.py:27).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Reference attention in plain jnp. q,k,v: (B, H, S, D) -> (B, H, S, D).

    Matches torch.nn.functional.scaled_dot_product_attention semantics: scale 1/sqrt(D),
    additive -inf upper-triangular mask when causal (reference transformer.py:22-25,28),
    dropout applied to the post-softmax probabilities.
    """
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    # fp32 islands for the softmax chain regardless of compute dtype.
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32,
                   precision=prec)
    s = s * scale
    if causal:
        q_len, k_len = q.shape[-2], k.shape[-2]
        # Causal over the *aligned suffix*: query i attends keys j <= i + (k_len - q_len)
        # (identical to the reference's sliced square mask when q_len == k_len).
        idx_q = jnp.arange(q_len)[:, None]
        idx_k = jnp.arange(k_len)[None, :]
        mask = idx_k <= idx_q + (k_len - q_len)
        s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32, precision=prec)
    return out.astype(q.dtype)


def _pick_impl(impl: Optional[str], dropout_rate: float) -> str:
    if impl in ("xla", "pallas"):
        return impl
    # Auto: pallas on TPU (with in-kernel dropout support); xla on CPU.
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "cpu"
    return "pallas" if platform == "tpu" else "xla"


def fused_qkv_attention(
    qkv: jax.Array,
    n_heads: int,
    *,
    causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    impl: Optional[str] = None,
    qkv_bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Attention straight off the packed QKV projection. qkv: (B, S, 3D) → (B, S, D).

    On the Pallas path the head split/merge happens inside the kernel via BlockSpecs
    (zero XLA layout copies — the round-2 profile showed ~0.7 ms/layer of glue for
    the rearrange-based path). Falls back to unpacking + ``multi_head_attention``
    when the packed kernel doesn't apply (CPU/xla impl, head_dim ∤ 128, long seqs).

    qkv_bias: optional (3D,) projection bias with ``qkv`` UNBIASED — on the
    packed Pallas path the bias is applied in-kernel and its gradient comes out
    of the kernel's VMEM accumulator (see flash_attention_packed); fallback
    paths just add it here."""
    b, s, three_d = qkv.shape
    n_embd = three_d // 3
    chosen = _pick_impl(impl, dropout_rate)
    if chosen == "pallas":
        from vit_tpu.kernels.attention import (flash_attention_packed,
                                               packed_supported)

        if packed_supported(n_heads, n_embd, s, dropout_rate):
            return flash_attention_packed(qkv, n_heads, causal=causal,
                                          dropout_rate=dropout_rate,
                                          dropout_rng=dropout_rng,
                                          qkv_bias=qkv_bias)
    if qkv_bias is not None:
        qkv = qkv + qkv_bias.astype(qkv.dtype)
    d = n_embd // n_heads
    q, k, v = (qkv.reshape(b, s, 3, n_heads, d)
               .transpose(2, 0, 3, 1, 4))
    out = multi_head_attention(q, k, v, causal=causal, dropout_rate=dropout_rate,
                               dropout_rng=dropout_rng, impl=impl)
    return out.transpose(0, 2, 1, 3).reshape(b, s, n_embd)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """Dispatching attention entry point. q,k,v: (B, H, S, D)."""
    chosen = _pick_impl(impl, dropout_rate)
    if chosen == "pallas":
        from vit_tpu.kernels.attention import flash_attention

        return flash_attention(q, k, v, causal=causal,
                               dropout_rate=dropout_rate,
                               dropout_rng=dropout_rng)
    return attention_xla(
        q, k, v, causal=causal, dropout_rate=dropout_rate, dropout_rng=dropout_rng
    )
