"""VideoGPT — causal AR transformer over flattened frame tokens
(reference train_videogpt.py:18-69).

Forward: flatten (B, T, N) frame tokens, prepend SOS (index == codebook_size), token +
position embeddings, causal Transformer, project to codebook logits, next-token CE.

Generation: the reference re-runs the full transformer per generated token — O(n²)
naive decode (train_videogpt.py:56-65). Here generation is a jitted ``lax.scan`` over
a KV cache (O(n), static shapes) with identical greedy-argmax semantics.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from vit_tpu.core.config import TransformerConfig, transformer_configs
from vit_tpu.core.transformer import Transformer
from vit_tpu.utils.init import dense, normal_embed_init


@dataclasses.dataclass(eq=False)
class VideoGPTConfig:
    """Mirror of the reference VideoGPTConfig (train_videogpt.py:18-27)."""

    frame_size: int          # tokens per frame
    codebook_size: int
    transformer: str
    max_frames: int
    dropout: float = 0.0

    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    quant: Optional[str] = None
    remat: bool = False
    scan_layers: bool = False
    pp_stages: int = 0
    pp_microbatches: int = 0

    def __post_init__(self):
        self.max_tokens = self.max_frames * self.frame_size
        self.trans_config: TransformerConfig = transformer_configs[self.transformer](
            block_size=self.max_tokens, dropout=self.dropout, causal=True,
            dtype=self.dtype, param_dtype=self.param_dtype,
            attn_impl=self.attn_impl, remat=self.remat,
            quant=self.quant, scan_layers=self.scan_layers,
            pp_stages=self.pp_stages, pp_microbatches=self.pp_microbatches)
        self.n_embd = self.trans_config.n_embd


class VideoGPT(nn.Module):
    """Decoder-only AR model (reference train_videogpt.py:38-69)."""

    config: VideoGPTConfig

    def setup(self):
        cfg = self.config
        tc = cfg.trans_config
        # +1 embedding row: SOS token is index codebook_size (train_videogpt.py:48)
        self.tok_embed = self.param("tok_embed", normal_embed_init,
                                    (cfg.codebook_size + 1, cfg.n_embd),
                                    tc.param_dtype)
        self.pos_embed = self.param("pos_embed", normal_embed_init,
                                    (cfg.max_tokens, cfg.n_embd), tc.param_dtype)
        self.transformer = Transformer(tc)
        self.proj = dense(cfg.codebook_size, cfg.n_embd, dtype=jnp.float32,
                          param_dtype=tc.param_dtype, name="proj")

    def __call__(self, x, deterministic: bool = True) -> Tuple[jax.Array, jax.Array]:
        """x: (B, T, N) int tokens -> (logits (B, T*N, C), scalar CE loss)."""
        cfg = self.config
        b, t, n = x.shape
        y = rearrange(x, "b t n -> b (t n)")
        sos = jnp.full((b, 1), cfg.codebook_size, jnp.int32)
        inp = jnp.concatenate([sos, y[:, :-1]], axis=-1)
        emb = (jnp.take(self.tok_embed, inp, axis=0)
               + self.pos_embed[None, : t * n]).astype(cfg.trans_config.dtype)
        h = self.transformer(emb, deterministic)
        logits = self.proj(h.astype(jnp.float32))
        loss = _cross_entropy(logits, y)
        return logits, loss

    def decode_step(self, token, pos) -> jax.Array:
        """One KV-cache decode step. token: (B, 1) int32 (SOS or a code), pos: scalar
        int32 position. Returns next-token logits (B, C)."""
        cfg = self.config
        emb = (jnp.take(self.tok_embed, token, axis=0)
               + jax.lax.dynamic_slice_in_dim(self.pos_embed, pos, 1)[None]
               ).astype(cfg.trans_config.dtype)
        h = self.transformer(emb, True, pos)
        return self.proj(h.astype(jnp.float32))[:, 0]

    def prefill(self, tokens) -> jax.Array:
        """Prime the KV cache with the whole conditioning prefix in ONE causal
        forward (positions [0, L)). tokens: (B, L) int32. Returns the last
        position's next-token logits (B, C)."""
        cfg = self.config
        length = tokens.shape[1]
        emb = (jnp.take(self.tok_embed, tokens, axis=0)
               + self.pos_embed[None, :length]).astype(cfg.trans_config.dtype)
        # static pos=0: multi-token cache writes are only correct from the start
        # of the sequence (see Attention._decode guard).
        h = self.transformer(emb, True, 0)
        return self.proj(h[:, -1].astype(jnp.float32))


def _cross_entropy(logits, targets):
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)


def init_cache(model: VideoGPT, params, batch_size: int):
    """Allocate the KV cache variable collection for a batch."""
    dummy = jnp.zeros((batch_size, 1), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), dummy, jnp.zeros((), jnp.int32),
                           method=VideoGPT.decode_step)
    return variables["cache"]


def _select_token(logits, *, temperature: float, top_k, rng) -> jax.Array:
    """logits (B, C) → next token (B,). temperature == 0: greedy argmax (the
    reference's semantics, train_videogpt.py:61). temperature > 0: softmax
    sampling at ``temperature``, optionally restricted to the ``top_k``
    highest-probability codes — the standard AR-decoding extension the
    reference lacks."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k is not None:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, jnp.finfo(logits.dtype).min, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnums=(0, 3), static_argnames=("temperature",
                                                          "top_k"))
def generate(model: VideoGPT, params, tokens: jax.Array, n: int, *,
             temperature: float = 0.0, top_k: "int | None" = None,
             rng: "jax.Array | None" = None) -> jax.Array:
    """AR generation (reference train_videogpt.py:56-65 semantics, KV-cache O(n)).

    tokens: (B, L) conditioning codes -> (B, L + n) codes. Default is greedy
    argmax (exact reference parity); temperature/top_k enable stochastic
    decoding (requires ``rng``; per-position keys are folded from it, so a
    fixed rng is reproducible).
    """
    cfg = model.config
    if cfg.pp_stages > 1:
        # pp is a training-time schedule; the KV-cache decode runs the scanned
        # stack instead, on reshaped params (a free reshape inside the jit) —
        # so in-training rollout evals work under a --mesh ...,pp run.
        from vit_tpu.core.transformer import convert_stack_layout

        model = VideoGPT(dataclasses.replace(cfg, pp_stages=0,
                                             scan_layers=True))
        params = dict(params)
        params["transformer"] = convert_stack_layout(
            dict(params["transformer"]), scan_layers=True)
        cfg = model.config
    b, cond_len = tokens.shape
    total = cond_len + n
    assert total <= cfg.max_tokens, (total, cfg.max_tokens)
    if temperature > 0.0 and rng is None:
        raise ValueError("temperature > 0 requires rng")
    if rng is None:
        rng = jax.random.PRNGKey(0)  # unused on the greedy path

    cache = init_cache(model, params, b)
    buf = jnp.concatenate(
        [jnp.full((b, 1), cfg.codebook_size, jnp.int32),       # SOS
         tokens.astype(jnp.int32),
         jnp.zeros((b, n), jnp.int32)], axis=-1)               # (B, 1 + total)

    # prefill: one causal forward primes the cache over [SOS, cond) and yields the
    # first generated token (vs the reference's per-token full re-forward,
    # train_videogpt.py:56-65, and vs per-token cache priming)
    logits, mutated = model.apply({"params": params, "cache": cache},
                                  buf[:, :cond_len + 1], method=VideoGPT.prefill,
                                  mutable=["cache"])
    cache = mutated["cache"]
    first = _select_token(logits, temperature=temperature, top_k=top_k,
                          rng=jax.random.fold_in(rng, cond_len))
    buf = jax.lax.dynamic_update_slice_in_dim(buf, first[:, None], cond_len + 1,
                                              axis=1)

    def step(carry, pos):
        buf, cache = carry
        tok = jax.lax.dynamic_slice_in_dim(buf, pos, 1, axis=1)
        logits, mutated = model.apply({"params": params, "cache": cache},
                                      tok, pos, method=VideoGPT.decode_step,
                                      mutable=["cache"])
        nxt = _select_token(logits, temperature=temperature, top_k=top_k,
                            rng=jax.random.fold_in(rng, pos + 1))       # (B,)
        buf = jax.lax.dynamic_update_slice_in_dim(buf, nxt[:, None], pos + 1,
                                                  axis=1)
        return (buf, mutated["cache"]), None

    if n > 1:
        (buf, _), _ = jax.lax.scan(step, (buf, cache),
                                   jnp.arange(cond_len + 1, total))
    return buf[:, 1:]


def generate_frames(model: VideoGPT, params, video_tokens: jax.Array,
                    n: int) -> jax.Array:
    """(B, T, N) conditioning frames -> (B, (T+n)*N) tokens
    (reference train_videogpt.py:66-69)."""
    tokens = rearrange(video_tokens, "b t n -> b (t n)")
    return generate(model, params, tokens, n * model.config.frame_size)
