"""Puzzle (MP3) self-supervised pretraining — masked position prediction.

Completes the reference's last unchecked paper (reference README.md:9, no code
shipped) in the reference's own script style. Cross-script import of the loader
builder mirrors the reference idiom (its train_titok.py:8 imports from train_vit).
Fine-tune afterwards with ``train_vit.py --init_from <ckpt_dir>`` — the loader
detects a Puzzle checkpoint and transfers patch-proj, learned pos-emb AND the
transformer stack (vit_tpu/models/puzzle.py:load_puzzle_into_vit).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from train_mae import get_loaders
from vit_tpu.data.resume import resume_stream, set_stream_epoch
from vit_tpu.models.puzzle import Puzzle, PuzzleConfig
from vit_tpu.train.checkpoint import Checkpointer
from vit_tpu.train.optim import make_optimizer
from vit_tpu.train.state import TrainState, params_str
from vit_tpu.train.step import make_puzzle_eval_step, make_puzzle_train_step
from vit_tpu.utils.config import str2bool
from vit_tpu.utils.logging import MetricsLogger


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_dir', type=str,
                        default='/mnt/data/Public_datasets/imagenet/imagenet_pytorch')
    parser.add_argument('--image_size', type=int, default=256)
    parser.add_argument('--in_channels', type=int, default=3)
    parser.add_argument('--patch_size', type=int, default=16)
    parser.add_argument('--transformer', type=str, default="B")
    parser.add_argument('--mask_ratio', type=float, default=0.75)
    parser.add_argument('--dropout', type=float, default=0.0)
    parser.add_argument('--bs', type=int, default=64)
    parser.add_argument('--mixed', type=str2bool, default=True)
    parser.add_argument('--lr', type=float, default=1.5e-4)
    parser.add_argument('--weight_decay', type=float, default=0.05)
    parser.add_argument('--warmup_steps', type=int, default=5000)
    parser.add_argument('--train_steps', type=int, default=500000)
    parser.add_argument('--epochs', type=int, default=10**9)
    parser.add_argument('--dataset', type=str, default='imagenet',
                        choices=['imagenet', 'synthetic', 'wds'])
    parser.add_argument('--wds_shards', type=str, default=None)
    parser.add_argument('--wds_streaming', type=str2bool, default=False)
    parser.add_argument('--shuffle_buffer', type=int, default=1000)
    parser.add_argument('--steps_per_epoch', type=int, default=50)
    parser.add_argument('--ckpt_dir', type=str, default='ckpt/puzzle')
    parser.add_argument('--resume', action='store_true')
    parser.add_argument('--attn_impl', type=str, default=None,
                        choices=[None, 'pallas', 'xla'])
    parser.add_argument('--scan_layers', type=str2bool, default=False,
                        help='compile each transformer stack as one lax.scan over stacked layer params: ~n_layers-fold smaller XLA program (much faster compiles), same math (vit_tpu/core/transformer.py)')
    parser.add_argument('--log_every', type=int, default=100)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--no_wandb', action='store_true')
    parser.add_argument('--run_dir', type=str, default=None,
                        help='metrics/TB/image output root (default: $VIT_TPU_RUN_DIR or runs/)')
    from vit_tpu.train.distributed import add_mesh_args
    add_mesh_args(parser)
    parser.add_argument('--loader_backend', type=str, default='threads',
                        choices=['threads', 'grain'])
    parser.add_argument('--loader_processes', type=int, default=0)
    args = parser.parse_args()
    args.min_lr = args.lr / 10
    return args


def main():
    from vit_tpu.utils.cache import enable_compilation_cache
    from vit_tpu.train.distributed import pp_from_args
    enable_compilation_cache()
    args = parse_args()
    dtype = jnp.bfloat16 if args.mixed else jnp.float32
    config = PuzzleConfig(args.image_size, args.in_channels, args.patch_size,
                          args.transformer, args.mask_ratio, args.dropout,
                          dtype=dtype, attn_impl=args.attn_impl,
                          scan_layers=args.scan_layers,
                          pp_stages=pp_from_args(args),
                          pp_microbatches=args.pp_microbatches)

    run_name = (f"puzzle_{args.patch_size}px_{args.image_size}px_"
                f"{args.transformer}_{args.mask_ratio}mr_{args.bs}bs_{args.lr}lr")
    logger = MetricsLogger("puzzle", run_name, config=vars(args),
                           out_dir=args.run_dir,
                           use_wandb=not args.no_wandb)

    train_loader, valid_loader = get_loaders(args)

    model = Puzzle(config)
    rng = jax.random.PRNGKey(args.seed)
    k_params, k_mask, k_drop, rng = jax.random.split(rng, 4)
    init_images = jnp.zeros((1, args.image_size, args.image_size, args.in_channels))
    params = jax.jit(model.init)({"params": k_params, "mask": k_mask,
                                  "dropout": k_drop}, init_images)["params"]
    tx = make_optimizer(args.lr, args.warmup_steps, args.train_steps, args.min_lr,
                        args.weight_decay, clip_norm=None)
    state = TrainState.create(params, tx)

    ckpt = Checkpointer(args.ckpt_dir, mode="max")   # best = highest position acc
    start_epoch, skip0 = 0, 0
    if args.resume and ckpt.can_restore():
        state = ckpt.restore(state)
        print(f"RESUMED at step {int(state.step)}")
        data_rs = ckpt.load_data_state(int(state.step))
        if data_rs:  # restore the input-stream position (vit_tpu/data/resume.py)
            start_epoch, skip0 = int(data_rs["epoch"]), int(data_rs["next_batch"])
            set_stream_epoch(train_loader, start_epoch)
            print(f"RESUMED data stream at epoch {start_epoch}, batch {skip0}")

    from vit_tpu.train.distributed import maybe_mesh_runner

    runner = maybe_mesh_runner(args)
    if runner is not None:
        state, st_sh = runner.shard_state(state)
        rng = runner.put_rep(rng)
        train_step = runner.jit_step(
            make_puzzle_train_step(model),
            in_specs=(st_sh, "batch", "rep"),
            out_specs=(st_sh, "rep"), donate_argnums=(0,))
        eval_step = runner.jit_step(
            make_puzzle_eval_step(model),
            in_specs=(st_sh.params, "batch", "rep"), out_specs="rep")
    else:
        train_step = jax.jit(make_puzzle_train_step(model), donate_argnums=(0,))
        eval_step = jax.jit(make_puzzle_eval_step(model))

    print(f"STATS: params={params_str(state.params)}")
    print(f"PARAMS: {config}")

    from vit_tpu.data.prefetch import device_prefetch
    from vit_tpu.train.preempt import GracefulShutdown

    shutdown = GracefulShutdown.install()
    put = (runner.put_batch if runner is not None else jnp.asarray)
    eval_rng = (runner.put_rep(jax.random.PRNGKey(args.seed + 7))
                if runner is not None else jax.random.PRNGKey(args.seed + 7))
    best_acc = -1.0
    for epoch in range(start_epoch, args.epochs):
        skip = skip0 if epoch == start_epoch else 0
        st = time.time()
        prev_loss = None
        for i, images in enumerate(device_prefetch(
                resume_stream(train_loader, skip),
                lambda b: put(b[0] if isinstance(b, (tuple, list))
                              else b)), start=skip):
            load_time = time.time() - st
            is_log = i % args.log_every == 0
            rebased = is_log and prev_loss is not None
            if rebased:
                float(jax.device_get(prev_loss))
                st = time.time()
            state, metrics = train_step(state, images, rng)
            prev_loss = metrics["train/loss"]
            if is_log:
                m = jax.device_get(metrics)
                loss = float(m["train/loss"])
                step_time = time.time() - st - (0.0 if rebased else load_time)
                logger.log({"train/loss": loss,
                            "train/pos_acc": float(m["train/pos_acc"]),
                            "train/epoch": epoch,
                            "benchmark/load_time": load_time,
                            "benchmark/step_time": step_time},
                           step=int(state.step))
                print(f"e={epoch} i={i} loss={loss:.4f} "
                      f"pos_acc={float(m['train/pos_acc']):.3f} "
                      f"load_time={load_time:.3f} step_time={step_time:.3f}")
            st = time.time()
            if shutdown.requested:
                step_final = int(jax.device_get(state.step))
                print(f"PREEMPTED: saving 'last' at step {step_final} "
                      "and exiting")
                ckpt.save(state, config=config, tag="last")
                ckpt.save_data_state(step_final,
                                     {"epoch": epoch, "next_batch": i + 1})
                ckpt.finalize()
                logger.close()
                return

        val_loss, val_acc, n = 0.0, 0.0, 0
        for batch in valid_loader:
            images = batch[0] if isinstance(batch, (tuple, list)) else batch
            m = jax.device_get(eval_step(state.params, put(images), eval_rng))
            val_loss += float(m["valid/loss"])
            val_acc += float(m["valid/pos_acc"])
            n += 1
        val_loss /= max(n, 1)
        val_acc /= max(n, 1)
        print(f"epoch {epoch}: val_loss={val_loss:.4f} pos_acc={val_acc:.3f}")
        logger.log({"valid/loss": val_loss, "valid/pos_acc": val_acc},
                   step=int(state.step))
        if val_acc > best_acc:
            best_acc = val_acc
            ckpt.save_if_best(state, val_acc, config=config)

    ckpt.save(state, config=config, tag="last")
    ckpt.save_data_state(int(jax.device_get(state.step)),
                         {"epoch": args.epochs, "next_batch": 0})
    ckpt.finalize()
    logger.close()


if __name__ == '__main__':
    main()
