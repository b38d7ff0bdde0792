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

from vit_tpu.train.optim import last_grad_norm
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
        metrics = {"train/loss": loss, "train/acc": acc}
        gn = last_grad_norm(state.opt_state)
        if gn is not None:  # free: the clip transform computed it anyway
            metrics["train/grad_norm"] = gn
        return state, metrics

    return train_step


def make_tokenizer_train_step(model, *, perceptual_loss_fn: Optional[Callable] = None,
                              perceptual_weight: float = 1.0,
                              pixel_loss: str = "l2",
                              watch: bool = False) -> Callable:
    """Tokenizer (TiTok / ViT-VQGAN) step.

    Reference loop bodies: train_titok.py:149-163 (pixel loss is squared error despite
    the ``l1_loss`` variable name), train_vit_vqgan.py:149-160 (true L1). Codebook
    usage is tracked as an on-device bitmap updated by scatter, replacing the
    reference's ``codebook_usage[indices] = 1`` (train_titok.py:164-167).

    ``watch=True`` (--watch): per-layer gradient+parameter HISTOGRAMS ride the
    metrics tree under "_hists" — the full wandb.watch parity surface
    (reference train_tatitok.py:155); computed on-device (64 bins/layer), the
    loop routes them to MetricsLogger.log_histograms at log points.
    """

    def train_step(state: TrainState, images, usage, rng):
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
        import os

        if os.environ.get("VIT_TPU_GRAD_BARRIER") == "1":
            # A/B probe (round 5), MEASURED NEGATIVE — keep off: the
            # clip-by-global-norm sum-of-squares fuses into every dW GEMM's
            # epilogue (the (f32[], dW) fusions at 166-172 TF/s vs the 191
            # envelope, ~3 ms/step of apparent drag). Un-fusing with a
            # barrier so the GEMMs run clean measured 296.3 vs 300.7 img/s
            # in-step: the separate sumsq streaming passes + the scheduling
            # disruption cost more than the epilogue drag — that pool is
            # effectively CLOSED (the fused form is the better one).
            grads = jax.tree.map(jax.lax.optimization_barrier, grads)
        if watch:
            from vit_tpu.utils.metrics import tree_histograms

            metrics["_hists"] = {**tree_histograms(grads, "grad_hist"),
                                 **tree_histograms(state.params, "param_hist")}
        state = state.apply_gradients(grads=grads)
        # wandb.watch-equivalent scalar (reference train_tatitok.py:155), read
        # from the recording clip's state — zero extra gradient passes
        gn = last_grad_norm(state.opt_state)
        if gn is not None:
            metrics["train/grad_norm"] = gn
        usage = usage.at[indices.reshape(-1)].set(1.0)
        metrics["train/codebook_usage"] = usage.mean()
        return state, usage, metrics, recon

    return train_step


def make_mae_train_step(model) -> Callable:
    """MAE pretraining step: masked-patch MSE (vit_tpu/models/mae.py; the reference
    lists MAE on its checklist, README.md:8, but has no code). The masking PRNG is
    a second fold of the step key so masks differ per step but replay on resume."""
    from vit_tpu.models.mae import mae_loss

    cfg = model.config

    def train_step(state: TrainState, images, rng):
        rng = jax.random.fold_in(rng, state.step)
        mask_rng, drop_rng = jax.random.split(rng)

        def loss_fn(params):
            pred, mask = model.apply(
                {"params": params}, images, False,
                rngs={"mask": mask_rng, "dropout": drop_rng})
            loss = mae_loss(pred, images, mask, cfg.patch_size, cfg.norm_pix)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        metrics = {"train/loss": loss}
        gn = last_grad_norm(state.opt_state)
        if gn is not None:
            metrics["train/grad_norm"] = gn
        return state, metrics

    return train_step


def make_mae_eval_step(model) -> Callable:
    """Validation: same masked loss with a fixed eval mask key (comparable across
    epochs) and dropout off."""
    from vit_tpu.models.mae import mae_loss

    cfg = model.config

    def eval_step(params, images, rng):
        pred, mask = model.apply({"params": params}, images, True,
                                 rngs={"mask": rng})
        return {"valid/loss": mae_loss(pred, images, mask, cfg.patch_size,
                                       cfg.norm_pix)}

    return eval_step


def make_puzzle_train_step(model) -> Callable:
    """Puzzle/MP3 pretraining step: masked position-prediction CE
    (vit_tpu/models/puzzle.py; reference README.md:9 checklist item, no code)."""
    from vit_tpu.models.puzzle import puzzle_loss

    def train_step(state: TrainState, images, rng):
        rng = jax.random.fold_in(rng, state.step)
        mask_rng, drop_rng = jax.random.split(rng)

        def loss_fn(params):
            logits, mask = model.apply(
                {"params": params}, images, False,
                rngs={"mask": mask_rng, "dropout": drop_rng})
            loss, acc = puzzle_loss(logits, mask)
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        metrics = {"train/loss": loss, "train/pos_acc": acc}
        gn = last_grad_norm(state.opt_state)
        if gn is not None:
            metrics["train/grad_norm"] = gn
        return state, metrics

    return train_step


def make_puzzle_eval_step(model) -> Callable:
    from vit_tpu.models.puzzle import puzzle_loss

    def eval_step(params, images, rng):
        logits, mask = model.apply({"params": params}, images, True,
                                   rngs={"mask": rng})
        loss, acc = puzzle_loss(logits, mask)
        return {"valid/loss": loss, "valid/pos_acc": acc}

    return eval_step


def make_classifier_eval_step(model) -> Callable:
    """Validation step (reference train_vit.py:114-125): CE loss + accuracy."""

    def eval_step(params, images, labels):
        logits = model.apply({"params": params}, images, True)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return {"valid/loss": loss, "valid/acc": acc}

    return eval_step
