"""shard_map data-parallel train step: Pallas kernels on per-shard data.

Under plain jit+GSPMD a ``pallas_call`` is an opaque custom call that XLA cannot
partition — it would force replication. ``shard_map`` runs the step body per device
shard, so the fused Pallas attention/VQ kernels execute on local data while gradients
are synchronized with an explicit ``pmean`` (vit_tpu/parallel/collectives.py) — the
"How to Scale Your Model" manual-collectives pattern, here for the DP axis the
reference's workloads semantically need (SURVEY.md §2c).

Params/optimizer state are replicated (pure DP); for FSDP/TP sharding use the
pjit path (parallel/sharding.py) with attn_impl="xla".
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vit_tpu.parallel.collectives import global_codebook_usage, psum_grads
from vit_tpu.train.state import TrainState


def make_dp_tokenizer_train_step(model, mesh: Mesh, *,
                                 perceptual_loss_fn: Optional[Callable] = None,
                                 perceptual_weight: float = 1.0,
                                 pixel_loss: str = "l2",
                                 axis: str = "data") -> Callable:
    """Data-parallel tokenizer step over ``mesh[axis]``; same signature/semantics as
    train.step.make_tokenizer_train_step but batch-sharded with per-shard kernels.

    Batch size must be divisible by the data-axis size. Returns a jitted callable
    (state, images, usage, rng) → (state, usage, metrics, recon)."""

    def local_step(state: TrainState, images, usage, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            recon, indices, quantize_loss = model.apply(
                {"params": params}, images, False, rngs={"dropout": rng})
            recon32 = recon.astype(jnp.float32)
            images32 = images.astype(jnp.float32)
            if pixel_loss == "l1":
                pix = jnp.mean(jnp.abs(recon32 - images32))
            else:
                pix = jnp.mean((recon32 - images32) ** 2)
            if perceptual_loss_fn is not None:
                perc = perceptual_weight * perceptual_loss_fn(recon32, images32)
            else:
                perc = jnp.zeros((), jnp.float32)
            recon_loss = pix + perc
            loss = recon_loss + quantize_loss
            metrics = {"train/loss": loss, "train/recon_loss": recon_loss,
                       "train/quant_loss": quantize_loss,
                       "train/perceptual_loss": perc, "train/l1_loss": pix}
            return loss, (indices, metrics, recon)

        (_, (indices, metrics, recon)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = psum_grads(grads, axis)                 # DP gradient sync
        state = state.apply_gradients(grads=grads)
        from vit_tpu.train.optim import last_grad_norm

        gn = last_grad_norm(state.opt_state)
        if gn is not None:
            metrics["train/grad_norm"] = gn
        local_usage = usage.at[indices.reshape(-1)].set(1.0)
        usage = global_codebook_usage(local_usage, axis)  # cross-replica union
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, axis), metrics)
        metrics["train/codebook_usage"] = usage.mean()
        return state, usage, metrics, recon

    rep = P()
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(rep, P(axis), rep, rep),
        out_specs=(rep, rep, rep, P(axis)),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 2))
