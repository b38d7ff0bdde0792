"""Shared pre-LN transformer core (Flax).

Capability-parity rebuild of the reference's minimal transformer (transformer.py:16-54):
pre-LN blocks of [LayerNorm → fused QKV attention] and [LayerNorm → 4× GELU MLP →
Dropout], residual adds around both, optional causal masking. The same module also
covers the Bytedance ``ResidualAttentionBlock`` layout (blocks.py:32-70) via
``ln_affine=True, attn_out_proj=True`` in the config — it is the same math with affine
LayerNorms and an attention output projection.

TPU-native aspects:
  - attention dispatches to the fused Pallas kernel (vit_tpu/kernels/attention.py);
  - LayerNorm statistics in fp32 inside a bf16 compute graph;
  - optional ``jax.checkpoint`` rematerialization per block (cfg.remat), the TPU
    equivalent of torch.utils.checkpoint at reference blocks.py:192;
  - batch-first (B, S, D) layout everywhere — no LND permutes (blocks.py:268-271 is a
    cuDNN-ism with no TPU benefit).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from vit_tpu.core.config import TransformerConfig
from vit_tpu.ops.gelu import gelu as gelu_op
from vit_tpu.ops.attention import fused_qkv_attention, multi_head_attention
from vit_tpu.utils.init import dense, torch_bias_init, torch_kernel_init


def _use_fused_fc(cfg: TransformerConfig) -> bool:
    """Gate for the fused dW+db MLP backward (kernels/fc_grad.py). None=auto:
    OFF — measured end-to-end NEGATIVE on the flagship step (245.1 vs 262.3
    img/s with VIT_TPU_FC_GRAD_T=explicit, the mode that WINS its standalone
    microbenchmark by +2.8 ms; BENCHMARKS.md round-3 close-out). Same failure
    shape as the LN→matmul fusion: a Pallas custom-call in the backward breaks
    XLA's surrounding fusions. VIT_TPU_FUSED_FC=0/1 overrides for A/B benching
    (the kernel interprets on CPU, so tests can force it on any backend)."""
    import os

    from vit_tpu.kernels.fc_grad import fused_dense_supported

    if cfg.quant is not None:
        return False
    if not fused_dense_supported(cfg.n_embd, 4 * cfg.n_embd):
        return False
    env = os.environ.get("VIT_TPU_FUSED_FC")
    if env is not None:
        return env != "0"
    if cfg.fused_fc_grad is not None:
        return cfg.fused_fc_grad
    return False


def _use_fused_ln(cfg: TransformerConfig, decode_pos) -> tuple:
    """(qkv, mlp) gates for fused LN→matmul (kernels/ln_matmul.py); applies to
    the non-affine pre-LN sites outside KV-cache decode. None = auto;
    VIT_TPU_FUSED_LN=0/1/qkv/mlp overrides (site-granular for A/B benching)."""
    import os

    if cfg.ln_affine or decode_pos is not None or cfg.quant is not None:
        return False, False
    from vit_tpu.kernels.ln_matmul import supported

    if not (supported(cfg.n_embd, 3 * cfg.n_embd)
            and supported(cfg.n_embd, 4 * cfg.n_embd)):
        return False, False
    env = os.environ.get("VIT_TPU_FUSED_LN")
    if env is not None:
        if env in ("qkv", "mlp"):
            return env == "qkv", env == "mlp"
        return (env != "0",) * 2
    if cfg.fused_ln is not None:
        return (cfg.fused_ln,) * 2
    # Auto default: OFF. Measured negative on the flagship (BENCHMARKS.md):
    # the fused forward kernels run at matmul roofline, but the custom_vjp's
    # backward glue (materialized dzc, standalone zpre convert, un-fused
    # LN-backward) costs more than the saved LN stats pass. Opt-in via config
    # or env for shapes where LN reads dominate.
    return False, False


class _ProjParams(nn.Module):
    """Param holder with nn.Dense's exact tree ({kernel, bias}) and torch
    nn.Linear init, for paths that apply the kernel and bias separately (the
    packed attention adds the qkv bias in-kernel so its backward can emit the
    bias gradient from VMEM — see kernels/attention.py)."""

    features: int
    fan_in: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_kernel_init,
                            (self.fan_in, self.features), self.param_dtype)
        bias = self.param("bias", torch_bias_init(self.fan_in),
                          (self.features,), self.param_dtype)
        return kernel, bias


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics; affine params optional (reference uses
    F.layer_norm without affine in the minimal core, transformer.py:43-44).
    Implemented inline (not a nested nn.LayerNorm) so affine params live directly at
    <name>/scale, <name>/bias — the layout torch checkpoint conversion maps onto."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        if cfg.ln_affine:
            scale = self.param("scale", nn.initializers.ones,
                               (cfg.n_embd,), cfg.param_dtype)
            bias = self.param("bias", nn.initializers.zeros,
                              (cfg.n_embd,), cfg.param_dtype)
            y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(cfg.dtype)


class Attention(nn.Module):
    """Fused-QKV multi-head self-attention (reference transformer.py:16-29).

    ``decode_pos`` switches to single-token KV-cache decoding: the key/value for the
    current position are written into a ``cache`` variable collection and the query
    attends over the cached prefix. This replaces the reference's O(n²) full
    re-forward per generated token (train_videogpt.py:56-65) with O(n) incremental
    decode while keeping greedy-argmax semantics.
    """

    config: TransformerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True, decode_pos=None,
                 fused_ln: bool = False):
        cfg = self.config
        if cfg.quant == "int8":
            # Serving-only int8 path (core/quant.py): int8 kernel + per-channel
            # scale, dynamic per-row activation quantization, MXU int8 matmul.
            # Bias stays split out exactly like the fp path below.
            from vit_tpu.core.quant import QuantProjParams, int8_matmul

            kernel_q, scale, bias = QuantProjParams(
                3 * cfg.n_embd, cfg.n_embd, name="qkv")()
            dt = cfg.dtype
            qkv_nb = int8_matmul(x, kernel_q, scale).astype(dt)
        else:
            # Same param tree as dense(name="qkv") but applied with the bias
            # split out: the packed Pallas path adds it in-kernel and emits its
            # gradient from a VMEM accumulator instead of an XLA full-dqkv
            # reduction pass.
            kernel, bias = _ProjParams(3 * cfg.n_embd, cfg.n_embd,
                                       param_dtype=cfg.param_dtype,
                                       name="qkv")()
            dt = cfg.dtype or jnp.result_type(x.dtype, kernel.dtype)
            if fused_ln:
                # x is the RAW residual stream: ln1 is fused into the qkv
                # matmul read (kernels/ln_matmul.py); the qkv bias stays in the
                # attention kernel as before.
                from vit_tpu.kernels.ln_matmul import fused_ln_matmul

                qkv_nb = fused_ln_matmul(x.astype(dt), kernel.astype(dt))
            else:
                qkv_nb = jnp.dot(x.astype(dt), kernel.astype(dt))
        if decode_pos is not None:
            qkv = qkv_nb + bias.astype(dt)
            q, k, v = rearrange(qkv, "b n (three h d) -> three b h n d",
                                three=3, h=cfg.n_heads)
            out = self._decode(q, k, v, decode_pos)
            out = rearrange(out, "b h n d -> b n (h d)")
        else:
            dropout_rate = 0.0 if deterministic else cfg.dropout
            dropout_rng = (self.make_rng("dropout")
                           if dropout_rate > 0.0 else None)
            # Packed path: head split/merge via kernel BlockSpecs, no rearranges.
            out = fused_qkv_attention(
                qkv_nb, cfg.n_heads,
                causal=cfg.causal,
                dropout_rate=dropout_rate,
                dropout_rng=dropout_rng,
                impl=cfg.attn_impl,
                qkv_bias=bias,
            )
        if cfg.attn_out_proj:
            if cfg.quant == "int8":
                from vit_tpu.core.quant import QuantDense

                out = QuantDense(cfg.n_embd, cfg.n_embd, dtype=cfg.dtype,
                                 name="out_proj")(out)
            else:
                out = dense(cfg.n_embd, cfg.n_embd, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype, name="out_proj")(out)
        return out

    def _decode(self, q, k, v, pos):
        """q,k,v: (B, H, S, D). S>1 ⇒ PREFILL: full causal attention over positions
        [pos, pos+S) with the keys/values written into the cache in one shot (the
        one-forward prime that replaces token-by-token conditioning). S==1 ⇒ one
        incremental decode step at `pos`."""
        cfg = self.config
        b, h, s_len, d = q.shape
        shape = (b, h, cfg.block_size, d)
        ck = self.variable("cache", "k", jnp.zeros, shape, cfg.dtype)
        cv = self.variable("cache", "v", jnp.zeros, shape, cfg.dtype)
        if s_len > 1:
            # Prefill attends only within the new block, so it is ONLY correct
            # from position 0 (otherwise queries would ignore the cached prefix
            # [0, pos)). Require a static int 0 rather than silently miscomputing.
            if not (isinstance(pos, int) and pos == 0):
                raise ValueError(
                    "multi-token decode (prefill) requires static pos=0; "
                    f"got pos={pos!r} for a {s_len}-token block")
            ck.value = jax.lax.dynamic_update_slice(
                ck.value, k.astype(cfg.dtype), (0, 0, pos, 0))
            cv.value = jax.lax.dynamic_update_slice(
                cv.value, v.astype(cfg.dtype), (0, 0, pos, 0))
            return multi_head_attention(q, k, v, causal=True, impl=cfg.attn_impl)
        ck.value = jax.lax.dynamic_update_slice(ck.value, k.astype(cfg.dtype),
                                                (0, 0, pos, 0))
        cv.value = jax.lax.dynamic_update_slice(cv.value, v.astype(cfg.dtype),
                                                (0, 0, pos, 0))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, ck.value,
                       preferred_element_type=jnp.float32)
        s = s * (d ** -0.5)
        mask = jnp.arange(cfg.block_size)[None, None, None, :] <= pos
        s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(cv.value.dtype), cv.value,
                         preferred_element_type=jnp.float32)
        return out.astype(q.dtype)


class Mlp(nn.Module):
    """4× GELU MLP with dropout (reference transformer.py:35-40)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True, fused_ln: bool = False):
        cfg = self.config
        # NOTE (negative result, measured): routing fc1 through a standalone
        # fused bias+GELU Pallas op (since pruned) to emit the fc1 bias
        # gradient from VMEM regressed the flagship step 260 -> 227 img/s —
        # splitting GELU out of XLA's fc1 matmul-epilogue fusion adds a full
        # (B·S,4C) HBM round-trip per layer that dwarfs the ~0.6 ms/layer db
        # re-read it saves. The fused_ln path below does NOT repeat that
        # mistake: ln2, fc1, its bias AND the GELU all run inside one kernel
        # (kernels/ln_matmul.py), so no epilogue fusion is split.
        if cfg.quant == "int8":
            # Serving-only int8 path; fused_ln/fused_fc are forced off by
            # their gates when quant is set.
            from vit_tpu.core.quant import QuantDense

            h = QuantDense(4 * cfg.n_embd, cfg.n_embd, dtype=cfg.dtype,
                           name="fc1")(x)
            h = gelu_op(h, cfg.gelu_impl)
            h = QuantDense(cfg.n_embd, 4 * cfg.n_embd, dtype=cfg.dtype,
                           name="fc2")(h)
            h = nn.Dropout(rate=cfg.dropout)(h, deterministic=deterministic)
            return h
        fused_fc = _use_fused_fc(cfg)
        if fused_ln:
            from vit_tpu.kernels.ln_matmul import fused_ln_matmul

            kernel, fc1_bias = _ProjParams(4 * cfg.n_embd, cfg.n_embd,
                                           param_dtype=cfg.param_dtype,
                                           name="fc1")()
            dt = cfg.dtype or jnp.result_type(x.dtype, kernel.dtype)
            h = fused_ln_matmul(x.astype(dt), kernel.astype(dt),
                                fc1_bias.astype(dt), gelu=True)
        elif fused_fc:
            # identical math and param tree to dense(name="fc1"); backward
            # emits dW and the bias grad in one pass over the upstream
            # gradient (kernels/fc_grad.py) — forward stays plain XLA so the
            # bias+GELU epilogue fusion is untouched
            from vit_tpu.kernels.fc_grad import fused_dense

            kernel, fc1_bias = _ProjParams(4 * cfg.n_embd, cfg.n_embd,
                                           param_dtype=cfg.param_dtype,
                                           name="fc1")()
            dt = cfg.dtype or jnp.result_type(x.dtype, kernel.dtype)
            h = fused_dense(x.astype(dt), kernel.astype(dt),
                            fc1_bias.astype(dt))
            h = gelu_op(h, cfg.gelu_impl)
        else:
            h = dense(4 * cfg.n_embd, cfg.n_embd, dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype, name="fc1")(x)
            # NOTE (measured, round 4): the fc1 fusion emits BOTH the pre- and
            # post-gelu (B,S,4E) planes as AD residuals (~2×126 MB/block at
            # flagship scale). Two attacks on the second write both LOST
            # in-step: remat_policy="dots" re-runs attention/LN in the bwd
            # (217.0 img/s), and a surgical jax.checkpoint region over
            # gelu+fc2 (recompute one elementwise op) measured 227.8 vs 262.3
            # img/s — the region boundary breaks XLA's fc2 epilogue fusion and
            # scheduling for more than the saved write. Keep plain AD.
            # torch GELU default is exact erf; the default "tanh_erf" impl
            # keeps those semantics at bf16 resolution while freeing the fc1
            # fusion's VPU (69 -> 122 TF/s, scripts/bench_fc1.py — round 5)
            h = gelu_op(h, cfg.gelu_impl)
        if fused_fc:
            from vit_tpu.kernels.fc_grad import fused_dense

            kernel2, fc2_bias = _ProjParams(cfg.n_embd, 4 * cfg.n_embd,
                                            param_dtype=cfg.param_dtype,
                                            name="fc2")()
            dt = cfg.dtype or jnp.result_type(x.dtype, kernel2.dtype)
            h = fused_dense(h.astype(dt), kernel2.astype(dt),
                            fc2_bias.astype(dt))
        else:
            h = dense(cfg.n_embd, 4 * cfg.n_embd, dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype, name="fc2")(h)
        h = nn.Dropout(rate=cfg.dropout)(h, deterministic=deterministic)
        return h


def _remat_policy(name):
    """cfg.remat_policy → jax.checkpoint policy. None = save nothing (full
    recompute, the memory-minimal default); "dots" = save matmul outputs so the
    backward recomputes only elementwise/LN work (jax.checkpoint_policies).
    ``VIT_TPU_REMAT_POLICY`` fills the default when the config leaves it unset
    (the same A/B-bench convention as VIT_TPU_FUSED_FC / VIT_TPU_FUSED_LN)."""
    if name is None:
        import os

        name = os.environ.get("VIT_TPU_REMAT_POLICY", "")
    if name in ("", "none", "everything"):
        return None  # nn.remat default: recompute everything
    if name == "dots":
        return jax.checkpoint_policies.checkpoint_dots
    if name == "dots_no_batch":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat_policy {name!r} "
                     "(expected none|dots|dots_no_batch)")


def _block_forward(cfg: TransformerConfig, x, deterministic, decode_pos):
    """Pre-LN block body shared by the unrolled and scanned stacks. Must be
    called inside an nn.compact __call__ — the submodules attach to the caller,
    so both stacks get the identical per-block param subtree."""
    fused_qkv, fused_mlp = _use_fused_ln(cfg, decode_pos)
    # Fused path: Attention/Mlp receive the RAW stream and fold the pre-LN
    # into their first matmul's operand read. Identical param tree either
    # way (non-affine LN has no params — gated in _use_fused_ln).
    h1 = x if fused_qkv else LayerNorm(cfg, name="ln1")(x)
    x = x + Attention(cfg, name="attn")(h1, deterministic, decode_pos,
                                        fused_ln=fused_qkv)
    h2 = x if fused_mlp else LayerNorm(cfg, name="ln2")(x)
    x = x + Mlp(cfg, name="mlp")(h2, deterministic, fused_ln=fused_mlp)
    return x


class TransformerLayer(nn.Module):
    """Pre-LN block (reference transformer.py:31-45)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True, decode_pos=None):
        return _block_forward(self.config, x, deterministic, decode_pos)


class _ScanBlock(nn.Module):
    """TransformerLayer with nn.scan's (carry, ys) calling convention."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True, decode_pos=None):
        return _block_forward(self.config, x, deterministic, decode_pos), None


class Transformer(nn.Module):
    """Stack of TransformerLayers (reference transformer.py:47-54).

    ``cfg.scan_layers`` compiles the stack as ONE ``lax.scan`` over a stacked
    param tree instead of ``n_layers`` unrolled copies — the XLA program
    shrinks ~n_layers-fold, which is the lever on compile time (flagship
    compiles through this environment's TPU tunnel take 10+ minutes unrolled).
    Param tree: ``layers/{ln*,attn,mlp}/...`` with a leading ``n_layers`` axis,
    vs the unrolled ``layer_{i}/...`` — convert with
    ``stack_layer_params``/``unstack_layer_params``. KV-cache decode works
    scanned too (the cache collection gains the same leading axis).

    ``cfg.pp_stages > 1`` adds GPipe-style pipeline parallelism on top of the
    stacked layout: params reshape to a leading ``(stages, layers_per_stage)``
    and the stage axis shards over the mesh "pipe" axis (parallel/sharding.py).
    The schedule is pure GSPMD — a ``nn.scan`` tick loop over an ``nn.vmap``
    of per-stage layer scans, with the stage→stage activation handoff as a
    ``jnp.roll`` on the pipe-sharded axis (XLA lowers it to collective-permute
    over ICI). No manual collectives, so autodiff/optimizer/checkpoint paths
    are unchanged. See :meth:`_pipeline` for the schedule."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True, decode_pos=None):
        cfg = self.config
        x = x.astype(cfg.dtype)
        if cfg.pp_stages > 1:
            if decode_pos is not None:
                raise NotImplementedError(
                    "KV-cache decode under pipeline parallelism is not "
                    "supported; pp_stages is a training-time feature "
                    "(export/serve artifacts from the converted checkpoint)")
            return self._pipeline(x, deterministic)
        if cfg.scan_layers:
            block = _ScanBlock
            if cfg.remat and decode_pos is None:
                block = nn.remat(block, static_argnums=(2,),
                                 prevent_cse=False,  # scan carries no CSE risk
                                 policy=_remat_policy(cfg.remat_policy))
            stack = nn.scan(
                block,
                variable_axes={"params": 0, "cache": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.n_layers,
                in_axes=(nn.broadcast, nn.broadcast),
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            x, _ = stack(cfg, name="layers")(x, deterministic, decode_pos)
            return x
        layer_cls = TransformerLayer
        if cfg.remat and decode_pos is None:
            layer_cls = nn.remat(TransformerLayer, static_argnums=(2,),
                                 policy=_remat_policy(cfg.remat_policy))
        for i in range(cfg.n_layers):
            x = layer_cls(cfg, name=f"layer_{i}")(x, deterministic,
                                                  decode_pos)
        return x

    def _pipeline(self, x, deterministic: bool):
        """GPipe schedule over the stacked stack, expressed in pure GSPMD.

        The batch splits into M microbatches; a tick loop of ``M + S - 1``
        iterations advances a ``(S, mb, T, D)`` state array where slot ``s``
        holds the microbatch currently inside stage ``s``. Every tick, all
        stages apply their local layers in parallel (an ``nn.vmap`` over the
        stage axis of the params — GSPMD partitions it along "pipe" so each
        device computes only its own stage), the last stage's output is
        collected, and the state rolls one slot forward (``jnp.roll`` on the
        pipe-sharded axis → one collective-permute per tick). Bubble fraction
        is ``(S-1)/(M+S-1)``; compute on not-yet-fed / drained slots is the
        bubble. Math is microbatch-independent, so outputs equal the
        ``scan_layers`` stack exactly (dropout streams differ: they split per
        (tick, stage) rather than per layer)."""
        cfg = self.config
        S_ = cfg.pp_stages
        if cfg.n_layers % S_:
            raise ValueError(f"n_layers={cfg.n_layers} not divisible by "
                             f"pp_stages={S_}")
        M = cfg.pp_microbatches or 2 * S_
        b, tok, d = x.shape
        if b % M:
            # init (b=1) and odd eval batches still run correctly: one
            # microbatch, S_ ticks, no overlap. Training batches should
            # divide pp_microbatches for real pipelining.
            M = 1
        mb = b // M
        # The fused Pallas attention kernel has no batching rule under the
        # stage-vmap; the XLA attention path vectorizes/shards cleanly.
        cfg_pp = cfg.replace(attn_impl="xla")

        block = _ScanBlock
        if cfg.remat:
            block = nn.remat(block, static_argnums=(2,), prevent_cse=False,
                             policy=_remat_policy(cfg.remat_policy))
        stage = nn.scan(
            block,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.n_layers // S_,
            in_axes=(nn.broadcast, nn.broadcast),
            metadata_params={nn.meta.PARTITION_NAME: None},
        )
        stages = nn.vmap(
            stage,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, None, None),
            out_axes=0,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )
        stages_mod = stages(cfg_pp, name="layers")

        # microbatch m takes batch rows m::M — the strided reshape keeps the
        # data-parallel shard dimension (mb) outermost-contiguous so the
        # "data" sharding lands on mb, not on the microbatch loop axis
        xs = x.reshape(mb, M, tok, d).transpose(1, 0, 2, 3)

        def tick(mod, carry, t):
            state, outs = carry
            feed = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            state = state.at[0].set(jnp.where(t < M, feed, state[0]))
            y, _ = mod(state, deterministic, None)
            cidx = jnp.clip(t - (S_ - 1), 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, cidx, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(t >= S_ - 1, y[-1], cur), cidx, 0)
            return (jnp.roll(y, 1, axis=0), outs), None

        carry0 = (jnp.zeros((S_, mb, tok, d), cfg.dtype),
                  jnp.zeros((M, mb, tok, d), cfg.dtype))
        ticks = nn.scan(tick,
                        variable_broadcast="params",
                        split_rngs={"params": False, "dropout": True},
                        length=M + S_ - 1)
        (_, outs), _ = ticks(stages_mod, carry0, jnp.arange(M + S_ - 1))
        return outs.transpose(1, 0, 2, 3).reshape(b, tok, d)


def stack_layer_params(tree: dict, n_layers: int) -> dict:
    """Unrolled transformer params (``layer_0..layer_{N-1}``) → the scanned
    layout (``layers`` with each leaf gaining a leading ``n_layers`` axis).
    Works on any subtree that directly contains the ``layer_i`` keys (e.g.
    ``params["transformer"]``); non-layer siblings pass through unchanged."""
    layers = [tree[f"layer_{i}"] for i in range(n_layers)]
    out = {k: v for k, v in tree.items() if not k.startswith("layer_")}
    out["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return out


def unstack_layer_params(tree: dict) -> dict:
    """Inverse of :func:`stack_layer_params`."""
    stacked = tree["layers"]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    out = {k: v for k, v in tree.items() if k != "layers"}
    for i in range(n):
        out[f"layer_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return out


def _n_lead_axes(layers: dict) -> int:
    """Leading stack axes on the block params: 1 = scan layout (n_layers,...),
    2 = pipeline layout (stages, layers_per_stage, ...). Probed off a kernel
    leaf (always 2-D underneath)."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(layers):
        if getattr(path[-1], "key", "") in ("kernel", "kernel_q"):
            return leaf.ndim - 2
    raise ValueError("no kernel leaf under the layers subtree")


def pipeline_layer_params(tree: dict, pp_stages: int) -> dict:
    """Scanned layout (leading ``n_layers`` axis) → the pipeline layout
    (leading ``(pp_stages, n_layers // pp_stages)`` axes) — a pure reshape."""
    stacked = tree["layers"]
    out = {k: v for k, v in tree.items() if k != "layers"}
    out["layers"] = jax.tree.map(
        lambda x: x.reshape((pp_stages, x.shape[0] // pp_stages) + x.shape[1:]),
        stacked)
    return out


def unpipeline_layer_params(tree: dict) -> dict:
    """Inverse of :func:`pipeline_layer_params`."""
    stacked = tree["layers"]
    out = {k: v for k, v in tree.items() if k != "layers"}
    out["layers"] = jax.tree.map(
        lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]), stacked)
    return out


def convert_stack_layout(tree: dict, scan_layers: bool,
                         pp_stages: int = 0) -> dict:
    """Normalize a Transformer param subtree to the requested layout — no-op
    when it already matches. Lets checkpoints cross the scan_layers /
    pp_stages boundaries (e.g. an unrolled MAE pretrain fine-tuned with
    --scan_layers true, or a --mesh ...,pp checkpoint exported for serving)."""
    if "layers" in tree and _n_lead_axes(tree["layers"]) == 2:
        tree = unpipeline_layer_params(tree)     # pipeline → scan first
    if scan_layers or pp_stages > 1:
        if any(k.startswith("layer_") for k in tree):
            tree = stack_layer_params(
                tree, sum(k.startswith("layer_") for k in tree))
    elif "layers" in tree:
        tree = unstack_layer_params(tree)
    if pp_stages > 1:
        tree = pipeline_layer_params(tree, pp_stages)
    return tree


def match_stack_layout(tree: dict, like: dict) -> dict:
    """Convert a Transformer param subtree to the stack layout of ``like``
    (unrolled / scan / pipeline, stages inferred from ``like``'s leading
    axis) — for checkpoint hand-offs where the target layout is whatever the
    fine-tune run was configured with (e.g. models/mae.py)."""
    if "layers" not in like:
        return convert_stack_layout(tree, scan_layers=False)
    if _n_lead_axes(like["layers"]) == 2:
        stages = jax.tree_util.tree_leaves(like["layers"])[0].shape[0]
        return convert_stack_layout(tree, scan_layers=True, pp_stages=stages)
    return convert_stack_layout(tree, scan_layers=True)
