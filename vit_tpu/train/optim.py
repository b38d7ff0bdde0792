"""Optimizer + LR schedule factories (optax).

LR schedule reproduces the reference's SequentialLR composition exactly
(reference utils.py:5-9): linear warmup for ``warmup_steps``, then CosineAnnealingLR
with T_max = ``train_steps`` evaluated for (train_steps − warmup_steps) of its own
steps, then a constant-at-base-lr tail (the reference's LambdaLR(lambda _: 1) phase —
a quirk, but part of the contract; runs rarely reach it).

AdamW matches torch.optim.AdamW defaults (betas (0.9, 0.999), eps 1e-8, decoupled
weight decay). Deliberate divergence from the reference (SURVEY.md §2d bug 2): gradient
clipping is applied BEFORE the optimizer update — the reference clips after
``scaler.step`` which has no effect (train_titok.py:160-162 et al.). Clip-then-step is
the behavior the code plainly intended.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def get_lr_schedule(lr: float, warmup_steps: int, train_steps: int,
                    min_lr: float) -> Callable:
    """SequentialLR-equivalent schedule (reference utils.py:5-9).

    step < warmup:       lr · step/warmup            (LambdaLR warmup)
    warmup ≤ step < T:   min_lr + (lr−min_lr)·(1+cos(π·(step−warmup)/T))/2
                         (CosineAnnealingLR with T_max=T, stepped from 0)
    step ≥ T:            lr                          (constant LambdaLR tail)
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * jnp.minimum(1.0, step / max(warmup_steps, 1))
        cos_step = step - warmup_steps
        cos = min_lr + (lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(math.pi * cos_step / max(train_steps, 1)))
        out = jnp.where(step < warmup_steps, warm, cos)
        out = jnp.where(step >= train_steps, lr, out)
        return out

    return schedule


class ClipWithNormState(NamedTuple):
    """State of clip_by_global_norm_recording: last observed pre-clip grad norm
    (the per-step wandb.watch-equivalent scalar, exposed for FREE — the clip had
    to compute it anyway; reading it from opt_state avoids a second full pass
    over the gradients)."""

    grad_norm: jnp.ndarray


def clip_by_global_norm_recording(max_norm: float) -> optax.GradientTransformation:
    """optax.clip_by_global_norm semantics, with the computed norm kept in state."""

    def init_fn(params):
        del params
        return ClipWithNormState(jnp.zeros((), jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        # bit-identical to optax.clip_by_global_norm's update
        trigger = jnp.squeeze(g_norm < max_norm)
        updates = jax.tree.map(
            lambda t: jax.lax.select(trigger, t,
                                     (t / g_norm.astype(t.dtype)) * max_norm),
            updates)
        return updates, ClipWithNormState(g_norm.astype(jnp.float32))

    return optax.GradientTransformation(init_fn, update_fn)


def last_grad_norm(opt_state) -> Optional[jnp.ndarray]:
    """Fish the recorded pre-clip gradient norm out of a (possibly nested)
    optimizer state tree; None if no recording clip is in the chain.
    optax states are nested (named)tuples — walk generically."""
    found = []
    stack = [opt_state]
    while stack:
        node = stack.pop()
        if isinstance(node, ClipWithNormState):
            found.append(node.grad_norm)
        elif isinstance(node, (tuple, list)):
            stack.extend(node)
    return found[0] if found else None


def make_optimizer(lr: float, warmup_steps: int, train_steps: int, min_lr: float,
                   weight_decay: float, *, clip_norm: Optional[float] = 1.0,
                   weight_decay_mask=None, b1: float = 0.9,
                   b2: float = 0.999,
                   mu_dtype: Optional[str] = "bfloat16"
                   ) -> optax.GradientTransformation:
    """AdamW + SequentialLR schedule + (optional) global-norm clip before the update.

    mu_dtype: dtype for the first-moment accumulator ("bfloat16" halves its HBM
    traffic in the update — the optimizer pass is bandwidth-bound; ~1 ms/step on
    the flagship). Default bfloat16 since round 3: loss-curve parity vs fp32
    validated over 500 flagship steps (runs/titok-synthetic, fp32-mu vs bf16-mu
    segments — tail-mean train/loss 0.394 vs 0.380, within run noise); pass
    None/"float32" for torch-parity fp32 moments. The second moment stays fp32
    (its dynamic range matters for eps-scale denominators)."""
    schedule = get_lr_schedule(lr, warmup_steps, train_steps, min_lr)
    chain = []
    if clip_norm is not None:
        chain.append(clip_by_global_norm_recording(clip_norm))
    chain.append(optax.adamw(
        learning_rate=schedule,
        b1=b1, b2=b2, eps=1e-8,
        weight_decay=weight_decay,
        mask=weight_decay_mask,
        mu_dtype=jnp.dtype(mu_dtype) if mu_dtype else None,
    ))
    return optax.chain(*chain)


def wd_exclude_mask(params) -> "jax.tree_util.PyTreeDef":
    """Weight-decay mask replicating the TATiTok ``make_optim`` exclusions
    (reference train_tatitok.py:95-111): decay only ndim≥2 params whose path does not
    mention norms/bias/embeddings/latent & mask tokens."""

    exclude_keywords = ("ln", "bias", "latent_tokens", "mask_token", "embedding",
                        "norm", "gamma", "embed")

    def decide(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path).lower()
        if leaf.ndim < 2:
            return False
        return not any(k in name for k in exclude_keywords)

    return jax.tree_util.tree_map_with_path(decide, params)
