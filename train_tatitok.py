"""TATiTok training (Bytedance-parity TiTok) — TPU-native.

CLI-surface parity with the reference train_tatitok.py:115-131 (same flags/defaults:
transformer "small", codebook 16384, warmup 10000, perceptual_weight 1.1), plus the
shared rebuild-only flags and --clustering_vq (the reference's dead multi-GPU codebook
reseeding, blocks.py:454-477, working here — see vit_tpu/quantize/bytedance_vq.py).

Optimizer: AdamW with the reference's weight-decay split (make_optim,
train_tatitok.py:95-111) via an optax mask; true micro-step gradient accumulation via
optax.MultiSteps; clip BEFORE step (the reference clips scaled grads pre-step,
train_tatitok.py:198-199 — closest intended semantics).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import optax

from vit_tpu.data.resume import resume_stream, set_stream_epoch
from vit_tpu.data.synthetic import SyntheticImageLoader
from vit_tpu.models.tatitok import TATiTok, TATiTokConfig
from vit_tpu.train.checkpoint import Checkpointer
from vit_tpu.train.loop import build_perceptual
from vit_tpu.train.optim import make_optimizer, wd_exclude_mask
from vit_tpu.train.state import TrainState, params_str
from vit_tpu.utils.logging import MetricsLogger
from vit_tpu.utils.config import str2bool


def parse_args():
    parser = argparse.ArgumentParser()
    # --- reference flag surface (train_tatitok.py:115-131) ---
    parser.add_argument('--patch_size', type=int, default=16)
    parser.add_argument('--latent_tokens', type=int, default=256)
    parser.add_argument('--codebook_size', type=int, default=16384)
    parser.add_argument('--latent_dim', type=int, default=12)
    parser.add_argument('--transformer', type=str, default='small',
                        choices=['small', 'base', 'large'])
    parser.add_argument('--bs', type=int, default=32)
    parser.add_argument('--micro_steps', type=int, default=1)
    parser.add_argument('--mixed', type=str2bool, default=True)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--perceptual_weight', type=float, default=1.1)
    parser.add_argument('--weight_decay', type=float, default=1e-4)
    parser.add_argument('--warmup_steps', type=int, default=10000)
    parser.add_argument('--train_steps', type=int, default=1_000_000)
    parser.add_argument('--dataset', type=str, default='imagenet',
                        choices=['imagenet', 'dmlab', 'minecraft', 'synthetic'])
    parser.add_argument('--epochs', type=int, default=100000)
    # --- rebuild-only flags ---
    parser.add_argument('--data_dir', type=str, default=None)
    parser.add_argument('--image_size', type=int, default=None,
                        help='set by --dataset as in the reference; override for '
                             'synthetic')
    parser.add_argument('--steps_per_epoch', type=int, default=100)
    parser.add_argument('--max_epoch_steps', type=int, default=0,
                        help='cap batches per epoch for any loader (0 = full '
                             'loader); smoke runs over huge virtual epochs, '
                             'and the per-epoch equalizer for uneven '
                             'multihost streaming shards')
    parser.add_argument('--perceptual_weights', type=str, default=None)
    parser.add_argument('--perceptual_quant', type=str, default=None,
                        choices=[None, 'int8'],
                        help='int8: run the frozen perceptual net on the '
                             'int8 MXU path (2x bf16 peak); loss semantics '
                             'unchanged (vit_tpu/losses/perceptual.py)')
    parser.add_argument('--use_l2_norm', type=str2bool, default=True)
    parser.add_argument('--clustering_vq', action='store_true')
    parser.add_argument('--attn_impl', type=str, default=None,
                        choices=[None, 'pallas', 'xla'])
    parser.add_argument('--scan_layers', type=str2bool, default=False,
                        help='compile each transformer stack as one lax.scan over stacked layer params: ~n_layers-fold smaller XLA program (much faster compiles), same math (vit_tpu/core/transformer.py)')
    parser.add_argument('--ckpt_dir', type=str, default='titok_models/tatitok')
    parser.add_argument('--resume', action='store_true')
    parser.add_argument('--ema_decay', type=float, default=0.0,
                        help='Polyak/EMA weight averaging (e.g. 0.999); the '
                        'average rides the checkpoint and can be evaled/'
                        'exported with --use_ema / ema=True')
    parser.add_argument('--log_every', type=int, default=100)
    parser.add_argument('--ckpt_every', type=int, default=250,
                        help='min steps between full checkpoint saves (saves move GBs device->host; decoupled from --log_every)')
    parser.add_argument('--image_every', type=int, default=5000)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--no_wandb', action='store_true')
    parser.add_argument('--run_dir', type=str, default=None,
                        help='metrics/TB/image output root (default: $VIT_TPU_RUN_DIR or runs/)')
    parser.add_argument('--watch', action='store_true',
                        help='log per-layer gradient+parameter histograms at '
                             'every log point (wandb.watch parity, reference '
                             'train_tatitok.py:155) to the TensorBoard sink/wandb')
    from vit_tpu.train.distributed import add_mesh_args
    add_mesh_args(parser)  # --mesh dp,fsdp,tp (shared across entry points)
    args = parser.parse_args()
    args.min_lr = args.lr / 10.0
    # dataset → image size (reference train_tatitok.py:134-146)
    sizes = {'imagenet': 256, 'dmlab': 64, 'minecraft': 128}
    if args.image_size is None:
        args.image_size = sizes.get(args.dataset, 64)
    return args


def get_loader(args):
    from vit_tpu.train.distributed import host_shard

    shard_id, num_shards = host_shard(args)  # this data-group's slice of the stream
    if args.dataset == 'synthetic':
        return SyntheticImageLoader(args.image_size, args.bs // args.micro_steps,
                                    steps_per_epoch=args.steps_per_epoch,
                                    seed=args.seed + 9973 * shard_id,
                                    mode='shapes')
    if args.dataset == 'imagenet':
        from vit_tpu.data.imagenet import get_imagenet_loaders

        return get_imagenet_loaders(args.image_size, args.bs // args.micro_steps,
                                    data_dir=args.data_dir, shard_id=shard_id,
                                    num_shards=num_shards)[0]
    from vit_tpu.data.video import (get_dmlab_image_loaders,
                                    get_minecraft_image_loaders)

    fn = (get_dmlab_image_loaders if args.dataset == 'dmlab'
          else get_minecraft_image_loaders)
    return fn(args.bs // args.micro_steps, dataset_path=args.data_dir,
              shard_id=shard_id, num_shards=num_shards)[0]


def main():
    from vit_tpu.utils.cache import enable_compilation_cache
    from vit_tpu.train.distributed import pp_from_args
    enable_compilation_cache()
    args = parse_args()
    dtype = jnp.bfloat16 if args.mixed else jnp.float32
    config = TATiTokConfig(args.image_size, args.patch_size, args.latent_tokens,
                           args.codebook_size, args.latent_dim, args.transformer,
                           use_l2_norm=args.use_l2_norm,
                           clustering_vq=args.clustering_vq,
                           dtype=dtype, attn_impl=args.attn_impl,
                           scan_layers=args.scan_layers,
                           pp_stages=pp_from_args(args),
                           pp_microbatches=args.pp_microbatches)

    project_name = f"titok-single-{args.dataset}"
    run_name = f"{args.transformer}_{args.latent_tokens}_{args.codebook_size}"
    logger = MetricsLogger(project_name, run_name, config=vars(args),
                           out_dir=args.run_dir,
                           use_wandb=not args.no_wandb)

    train_loader = get_loader(args)

    model = TATiTok(config)
    rng = jax.random.PRNGKey(args.seed)
    init_x = jnp.zeros((1, args.image_size, args.image_size, 3))
    variables = jax.jit(lambda: model.init(rng, init_x, None, True))()
    params = variables["params"]
    vq_stats = variables.get("vq_stats", {})

    perceptual = build_perceptual(args, dtype)

    # weight-decay split (reference make_optim, train_tatitok.py:95-111)
    tx = make_optimizer(args.lr, args.warmup_steps, args.train_steps, args.min_lr,
                        args.weight_decay, clip_norm=1.0,
                        weight_decay_mask=wd_exclude_mask(params))
    if args.micro_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=args.micro_steps)
    state = TrainState.create(params, tx)

    ckpt = Checkpointer(args.ckpt_dir, mode="min")
    start_epoch, skip0, step0 = 0, 0, 0
    if args.resume and ckpt.can_restore():
        if vq_stats:
            # clustering-EMA accumulators are training state too: without
            # restoring them a resumed --clustering_vq run silently reseeds
            # the EMA from zero (checkpoint "extra" tree; older checkpoints
            # restore without it and keep the fresh init)
            state, restored_extra = ckpt.restore(
                state, extra_template={"vq_stats": vq_stats})
            if restored_extra:
                vq_stats = restored_extra["vq_stats"]
        else:
            state = ckpt.restore(state)
        print(f"RESUMED at step {int(state.step)}")
        data_rs = ckpt.load_data_state(int(state.step))
        if data_rs:  # restore the input-stream position (vit_tpu/data/resume.py)
            start_epoch, skip0 = int(data_rs["epoch"]), int(data_rs["next_batch"])
            step0 = int(data_rs.get("consumed", 0))
            set_stream_epoch(train_loader, start_epoch)
            print(f"RESUMED data stream at epoch {start_epoch}, batch {skip0}")

    clustering = args.clustering_vq

    def _make_train_step(watch):
      def _train_step(state, vq_stats, images, usage):
        def loss_fn(params):
            (recon, result), new_vars = model.apply(
                {"params": params, "vq_stats": vq_stats}, images, None, True,
                mutable=["vq_stats"])
            recon32 = recon.astype(jnp.float32)
            images32 = images.astype(jnp.float32)
            l1_loss = jnp.mean((recon32 - images32) ** 2)  # squared despite the name
            # (reference train_tatitok.py:188)
            if perceptual is not None:
                perc = args.perceptual_weight * perceptual(recon32, images32)
            else:
                perc = jnp.zeros((), jnp.float32)
            recon_loss = l1_loss + perc
            loss = recon_loss + result["quantizer_loss"]
            metrics = {"train/loss": loss, "train/recon_loss": recon_loss,
                       "train/quant_loss": result["quantizer_loss"],
                       "train/perceptual_loss": perc, "train/l1_loss": l1_loss}
            return loss, (result, new_vars.get("vq_stats", vq_stats), recon, metrics)

        (_, (result, vq_stats_new, recon, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if watch:
            # the reference's wandb.watch(model) lives in THIS script
            # (train_tatitok.py:155): per-layer grad+param histograms,
            # computed on device (utils/metrics.py:tree_histograms) — in the
            # log-step-only variant, so off-log steps pay nothing
            from vit_tpu.utils.metrics import tree_histograms

            metrics["_hists"] = {**tree_histograms(grads, "grad_hist"),
                                 **tree_histograms(state.params, "param_hist")}
        if clustering:
            # install the reseeded codebook before the gradient update — the torch
            # ordering (in-forward .data mutation, then optimizer step)
            params = dict(state.params)
            quant = dict(params["quantize"])
            quant["embedding"] = result["new_embedding"]
            params["quantize"] = quant
            state = state.replace(params=params)
        state = state.apply_gradients(grads=grads)
        usage = usage.at[result["min_encoding_indices"].reshape(-1)].set(1.0)
        metrics["train/codebook_usage"] = usage.mean()
        return state, vq_stats_new, usage, metrics, recon

      return _train_step

    _train_step = _make_train_step(False)
    _train_step_watch = _make_train_step(True) if args.watch else None

    from vit_tpu.train.distributed import maybe_mesh_runner

    runner = maybe_mesh_runner(args)  # --mesh dp,fsdp,tp; None = single device
    if runner is not None:
        state, st_sh = runner.shard_state(state)
        vq_stats = runner.put_rep(vq_stats)
        # vq_stats (clustering-EMA accumulators) stay replicated: the kernel
        # computes GLOBAL-batch stats, GSPMD inserts the cross-shard psum

        def _jit(fn):
            return runner.jit_step(
                fn, in_specs=(st_sh, "rep", "batch", "rep"),
                out_specs=(st_sh, "rep", "rep", "rep", "batch"))

        train_step = _jit(_train_step)
        train_step_watch = _jit(_train_step_watch) if args.watch else None
    else:
        train_step = jax.jit(_train_step)
        train_step_watch = (jax.jit(_train_step_watch)
                            if args.watch else None)

    print(f"STATS: enc_params={params_str(state.params)}")

    from vit_tpu.train.preempt import GracefulShutdown

    shutdown = GracefulShutdown.install()
    best_recon = float("inf")
    usage = jnp.zeros((config.codebook_size,), jnp.float32)
    step = step0
    prev_loss = None
    for epoch in range(start_epoch, args.epochs):
        skip = skip0 if epoch == start_epoch else 0
        st = time.time()
        stream = resume_stream(train_loader, skip)
        if args.max_epoch_steps:  # same cap semantics as train/loop.py
            import itertools

            # cap bounds the EPOCH: a resumed epoch already consumed `skip`
            stream = itertools.islice(stream,
                                      max(0, args.max_epoch_steps - skip))
        for i, (images, _) in enumerate(stream, start=skip):
            load_time = time.time() - st
            images = (runner.put_batch(images) if runner is not None
                      else jnp.asarray(images))
            is_log = step % args.log_every == 0
            rebased = is_log and prev_loss is not None
            if rebased:
                # drain the async-dispatch backlog so step_time measures ONE
                # step, not up to log_every queued ones (see train/loop.py)
                float(jax.device_get(prev_loss))
                st = time.time()
            fn = (train_step_watch
                  if (train_step_watch is not None and is_log) else train_step)
            state, vq_stats, usage, metrics, recon = fn(
                state, vq_stats, images, usage)
            prev_loss = metrics["train/loss"]
            if is_log:
                metrics = dict(jax.device_get(metrics))
                hists = metrics.pop("_hists", None)
                if hists is not None:
                    logger.log_histograms(
                        hists, step=int(jax.device_get(state.step)))
                host = {k: float(v) for k, v in metrics.items()}
                step_time = time.time() - st - (0.0 if rebased else load_time)
                host.update({"train/epoch": epoch,
                             "benchmark/load_time": load_time,
                             "benchmark/step_time": step_time})
                logger.log(host, step=int(jax.device_get(state.step)))
                print(f"e={epoch} s={step} loss={host['train/loss']:.3f} "
                      f"recon={host['train/recon_loss']:.3f} "
                      f"quant={host['train/quant_loss']:.3f} "
                      f"usage={host['train/codebook_usage']:.3f} "
                      f"step_time={step_time:.3f}")
                if host["train/recon_loss"] < best_recon:
                    best_recon = host["train/recon_loss"]
                    extra = {"vq_stats": vq_stats} if vq_stats else None
                    ckpt.save_if_best(state, host["train/recon_loss"],
                                      config=config, extra=extra)
                    # rolling "last" + input-stream position: crash recovery
                    # via --resume (see vit_tpu/train/loop.py)
                    ckpt.save(state, config=config, tag="last", extra=extra)
                    ckpt.save_data_state(int(jax.device_get(state.step)),
                                         {"epoch": epoch, "next_batch": i + 1,
                                          "consumed": step + 1})
            if step % args.image_every == 0:
                if getattr(recon, "is_fully_addressable", True):
                    logger.log_images(
                        {"images": jax.device_get(images[:4]),
                         "reconstructions": jax.device_get(recon[:4])},
                        step=int(jax.device_get(state.step)))
                usage = usage * 0.0
            step += 1
            st = time.time()
            if shutdown.requested:
                # SIGTERM (preemption grace window): persist the exact step
                # and exit cleanly so --resume continues from here.
                step_final = int(jax.device_get(state.step))
                print(f"PREEMPTED: saving 'last' at step {step_final} "
                      "and exiting")
                ckpt.save(state, config=config, tag="last",
                          extra={"vq_stats": vq_stats} if vq_stats else None)
                ckpt.save_data_state(step_final,
                                     {"epoch": epoch, "next_batch": i + 1,
                                      "consumed": step})
                ckpt.finalize()
                logger.close()
                return

    ckpt.save(state, config=config, tag="last",
              extra={"vq_stats": vq_stats} if vq_stats else None)
    ckpt.save_data_state(int(jax.device_get(state.step)),
                         {"epoch": args.epochs, "next_batch": 0,
                          "consumed": step})
    ckpt.finalize()
    logger.close()


if __name__ == '__main__':
    main()
