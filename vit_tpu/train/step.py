"""Jitted train/eval step factories.

One factory per training entry point, mirroring the reference loop bodies (e.g.
train_vit.py:96-110) as single fused XLA programs: forward, loss, backward, clip,
AdamW update and on-device metrics in one jit — no per-step host sync (the reference
syncs every step via ``loss.item()``; here metrics come back as device arrays the
caller may batch/flush asynchronously).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from vit_tpu.train.state import TrainState


def make_classifier_train_step(model) -> Callable:
    """ViT classification step (reference train_vit.py:96-110): CE loss on logits."""

    def train_step(state: TrainState, images, labels, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits = model.apply({"params": params}, images, False,
                                 rngs={"dropout": rng})
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return state, {"train/loss": loss, "train/acc": acc}

    return train_step


def make_classifier_eval_step(model) -> Callable:
    """Validation step (reference train_vit.py:114-125): CE loss + accuracy."""

    def eval_step(params, images, labels):
        logits = model.apply({"params": params}, images, True)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return {"valid/loss": loss, "valid/acc": acc}

    return eval_step
