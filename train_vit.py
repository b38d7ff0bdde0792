"""Supervised ViT classification training (TPU-native).

CLI-surface parity with the reference train_vit.py:56-71 (same flags, same defaults),
plus rebuild-only flags: --dataset (synthetic smoke path, CPU-runnable per
BASELINE.json configs[0]), --ckpt_dir/--resume, --steps_per_epoch, --attn_impl.

Deliberate fixes vs the reference (SURVEY.md §2d):
  - logs every `--log_every` steps (the reference's `if i % 100:` logs on all steps
    EXCEPT multiples of 100, train_vit.py:109);
  - valid/loss logs the actual validation loss (the reference logs the last train-batch
    loss, train_vit.py:126);
  - no GradScaler: TPU bf16 needs no loss scaling.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.data.resume import resume_stream, set_stream_epoch
from vit_tpu.data.synthetic import SyntheticImageLoader
from vit_tpu.models.vit import ViTClassifier, ViTConfig
from vit_tpu.train.checkpoint import Checkpointer
from vit_tpu.train.optim import make_optimizer
from vit_tpu.train.state import TrainState, params_str
from vit_tpu.train.step import make_classifier_eval_step, make_classifier_train_step
from vit_tpu.utils.logging import MetricsLogger
from vit_tpu.utils.config import str2bool


def parse_args():
    parser = argparse.ArgumentParser()
    # --- reference flag surface (train_vit.py:56-71) ---
    parser.add_argument('--data_dir', type=str,
                        default='/mnt/data/Public_datasets/imagenet/imagenet_pytorch')
    parser.add_argument('--image_size', type=int, default=256)
    parser.add_argument('--in_channels', type=int, default=3)
    parser.add_argument('--patch_size', type=int, default=16)
    parser.add_argument('--extra_tokens', type=int, default=1)
    parser.add_argument('--transformer', type=str, default="L")
    parser.add_argument('--dropout', type=float, default=0.15)
    parser.add_argument('--bs', type=int, default=64)
    parser.add_argument('--mixed', type=str2bool, default=True)  # bf16 compute when True
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--weight_decay', type=float, default=1e-2)
    parser.add_argument('--warmup_steps', type=int, default=5000)
    parser.add_argument('--train_steps', type=int, default=500000)
    parser.add_argument('--epochs', type=int, default=10**9)
    # --- rebuild-only flags ---
    parser.add_argument('--dataset', type=str, default='imagenet',
                        choices=['imagenet', 'synthetic', 'wds'])
    parser.add_argument('--wds_shards', type=str, default=None,
                        help='glob of webdataset tar shards (jpg+cls), e.g. '
                             '"shards/train-*.tar" (BASELINE configs[0] path)')
    parser.add_argument('--wds_streaming', type=str2bool, default=False,
                        help='stream shards sequentially with a bounded shuffle '
                             'buffer (ImageNet-scale; memory-independent of shard '
                             'count) instead of the in-memory map-style reader')
    parser.add_argument('--shuffle_buffer', type=int, default=1000)
    parser.add_argument('--num_classes', type=int, default=1000)
    parser.add_argument('--steps_per_epoch', type=int, default=50,
                        help='synthetic dataset epoch length')
    parser.add_argument('--ckpt_dir', type=str, default='ckpt/vit')
    parser.add_argument('--resume', action='store_true')
    parser.add_argument('--init_from', type=str, default=None,
                        help='MAE or Puzzle checkpoint dir: initialize the ViT '
                             'encoder from a self-supervised pretrain '
                             '(train_mae.py / train_puzzle.py fine-tuning recipe)')
    parser.add_argument('--attn_impl', type=str, default=None,
                        choices=[None, 'pallas', 'xla'])
    parser.add_argument('--scan_layers', type=str2bool, default=False,
                        help='compile the transformer stack as one lax.scan '
                             'over stacked layer params: ~n_layers-fold '
                             'smaller XLA program (much faster compiles), '
                             'same math (vit_tpu/core/transformer.py)')
    parser.add_argument('--log_every', type=int, default=100)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--no_wandb', action='store_true')
    parser.add_argument('--run_dir', type=str, default=None,
                        help='metrics/TB/image output root (default: $VIT_TPU_RUN_DIR or runs/)')
    from vit_tpu.train.distributed import add_mesh_args
    add_mesh_args(parser)  # --mesh dp,fsdp,tp (shared across entry points)
    parser.add_argument('--loader_backend', type=str, default='threads',
                        choices=['threads', 'grain'],
                        help='host input-pipeline backend (grain = Google Grain)')
    parser.add_argument('--loader_processes', type=int, default=0,
                        help='grain multiprocess worker count (0 = in-process '
                             'reader threads); only with --loader_backend grain')
    args = parser.parse_args()
    args.min_lr = args.lr / 10  # reference train_vit.py:72
    return args


def get_loaders(args):
    from vit_tpu.train.distributed import host_shard

    shard_id, num_shards = host_shard(args)  # this data-group's slice of the stream
    if args.dataset == 'synthetic':
        train = SyntheticImageLoader(args.image_size, args.bs,
                                     num_classes=args.num_classes,
                                     in_channels=args.in_channels,
                                     steps_per_epoch=args.steps_per_epoch,
                                     seed=args.seed + 9973 * shard_id)
        valid = SyntheticImageLoader(args.image_size, 2 * args.bs,
                                     num_classes=args.num_classes,
                                     in_channels=args.in_channels,
                                     steps_per_epoch=max(1, args.steps_per_epoch // 10),
                                     seed=args.seed + 1 + 9973 * shard_id)
        return train, valid
    if args.dataset == 'wds':
        import glob

        from vit_tpu.data.loader import DataLoader
        from vit_tpu.data.wds import WdsImageClassification

        shards = sorted(glob.glob(args.wds_shards))
        if not shards:
            raise FileNotFoundError(f"no shards match {args.wds_shards}")
        if args.wds_streaming:
            from vit_tpu.data.wds import streaming_image_loader

            train = streaming_image_loader(
                shards, args.image_size, args.bs, train=True,
                shuffle_buffer=args.shuffle_buffer, seed=args.seed,
                shard_id=shard_id, num_shards=num_shards)
            valid = streaming_image_loader(shards, args.image_size, 2 * args.bs,
                                           train=False, shard_id=shard_id,
                                           num_shards=num_shards)
            return train, valid
        train_set = WdsImageClassification(shards, args.image_size, train=True)
        valid_set = WdsImageClassification(shards, args.image_size, train=False)
        return (DataLoader(train_set, args.bs, shuffle=True, drop_last=True,
                           shard_id=shard_id, num_shards=num_shards),
                DataLoader(valid_set, 2 * args.bs, shuffle=False, drop_last=False,
                           shard_id=shard_id, num_shards=num_shards))
    from vit_tpu.data.imagenet import get_imagenet_loaders

    return get_imagenet_loaders(args.image_size, args.bs, data_dir=args.data_dir,
                                backend=args.loader_backend,
                                processes=args.loader_processes,
                                shard_id=shard_id, num_shards=num_shards)


def main():
    from vit_tpu.utils.cache import enable_compilation_cache
    from vit_tpu.train.distributed import pp_from_args
    enable_compilation_cache()
    args = parse_args()
    dtype = jnp.bfloat16 if args.mixed else jnp.float32
    vit_config = ViTConfig(args.image_size, args.in_channels, args.patch_size,
                           args.transformer, args.extra_tokens, args.dropout,
                           dtype=dtype, attn_impl=args.attn_impl,
                           scan_layers=args.scan_layers,
                           pp_stages=pp_from_args(args),
                           pp_microbatches=args.pp_microbatches)

    run_name = (f"{args.patch_size}px_{args.image_size}px_{args.transformer}_"
                f"{args.bs}bs_{args.lr}lr_{args.dropout}drp")
    logger = MetricsLogger("vit-classifier", run_name, config=vars(args),
                           out_dir=args.run_dir,
                           use_wandb=not args.no_wandb)

    train_loader, valid_loader = get_loaders(args)

    model = ViTClassifier(vit_config, num_classes=args.num_classes)
    rng = jax.random.PRNGKey(args.seed)
    init_images = jnp.zeros((1, args.image_size, args.image_size, args.in_channels))
    params = jax.jit(model.init)(rng, init_images)["params"]
    if args.init_from:
        # self-supervised fine-tuning hand-off; the param-tree shape tells the
        # source apart (MAE nests under "encoder", Puzzle is ViT-shaped)
        from vit_tpu.train.checkpoint import load_params

        pre = load_params(args.init_from)
        if "encoder" in pre:
            from vit_tpu.models.mae import load_encoder_into_vit

            params = load_encoder_into_vit(pre, params)
            print(f"INIT encoder from MAE checkpoint {args.init_from}")
        else:
            from vit_tpu.models.puzzle import load_puzzle_into_vit

            params = load_puzzle_into_vit(pre, params)
            print(f"INIT encoder from Puzzle checkpoint {args.init_from}")
    tx = make_optimizer(args.lr, args.warmup_steps, args.train_steps, args.min_lr,
                        args.weight_decay, clip_norm=None)  # reference applies no
    # effective clipping in this script (no clip call at all, train_vit.py:96-110)
    state = TrainState.create(params, tx)

    ckpt = Checkpointer(args.ckpt_dir, mode="max")
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

    runner = maybe_mesh_runner(args)  # --mesh dp,fsdp,tp; None = single device
    if runner is not None:
        state, st_sh = runner.shard_state(state)
        rng = runner.put_rep(rng)
        train_step = runner.jit_step(
            make_classifier_train_step(model),
            in_specs=(st_sh, "batch", "batch", "rep"),
            out_specs=(st_sh, "rep"), donate_argnums=(0,))
        eval_step = runner.jit_step(
            make_classifier_eval_step(model),
            in_specs=(st_sh.params, "batch", "batch"), out_specs="rep")
    else:
        train_step = jax.jit(make_classifier_train_step(model), donate_argnums=(0,))
        eval_step = jax.jit(make_classifier_eval_step(model))

    print(f"STATS: params={params_str(state.params)}, "
          f"trn_len={getattr(train_loader, '__len__', lambda: '?')()}, "
          f"val_len={getattr(valid_loader, '__len__', lambda: '?')()}")
    print(f"PARAMS: {vit_config}")

    # issue batch N+1's host->device transfer before batch N is consumed so
    # the DMA overlaps the previous step's compute (vit_tpu/data/prefetch.py)
    from vit_tpu.data.prefetch import device_prefetch
    from vit_tpu.train.preempt import GracefulShutdown

    shutdown = GracefulShutdown.install()
    put = (runner.put_batch if runner is not None else jnp.asarray)
    best_acc = 0.0
    for epoch in range(start_epoch, args.epochs):
        skip = skip0 if epoch == start_epoch else 0
        st = time.time()
        window_metrics = []
        prev_loss = None
        for i, (images, labels) in enumerate(device_prefetch(
                resume_stream(train_loader, skip),
                lambda b: (put(b[0]), put(b[1]))), start=skip):
            load_time = time.time() - st
            is_log = i % args.log_every == 0
            rebased = is_log and prev_loss is not None
            if rebased:
                # drain the async-dispatch backlog so step_time measures ONE
                # step, not up to log_every queued ones (see train/loop.py)
                float(jax.device_get(prev_loss))
                st = time.time()
            state, metrics = train_step(state, images, labels, rng)
            prev_loss = metrics["train/loss"]
            window_metrics.append(metrics)
            if is_log:
                # one device_get round-trip for all logged scalars (see
                # vit_tpu/train/loop.py)
                m = jax.device_get(metrics)
                loss = float(m["train/loss"])
                step_time = time.time() - st - (0.0 if rebased else load_time)
                logger.log({"train/loss": loss,
                            "train/acc": float(m["train/acc"]),
                            "train/epoch": epoch,
                            "benchmark/load_time": load_time,
                            "benchmark/step_time": step_time},
                           step=int(state.step))
                print(f"e={epoch} i={i} loss={loss:.3f} "
                      f"load_time={load_time:.3f} step_time={step_time:.3f}")
            st = time.time()
            if shutdown.requested:
                # SIGTERM (preemption grace window): persist the exact step
                # and exit cleanly so --resume continues from here.
                step_final = int(jax.device_get(state.step))
                print(f"PREEMPTED: saving 'last' at step {step_final} "
                      "and exiting")
                ckpt.save(state, config=vit_config, tag="last")
                ckpt.save_data_state(step_final,
                                     {"epoch": epoch, "next_batch": i + 1})
                ckpt.finalize()
                logger.close()
                return

        # per-epoch validation (reference train_vit.py:114-125)
        val_loss, acc, n = 0.0, 0.0, 0
        for images, labels in valid_loader:
            if runner is not None:
                images = runner.put_batch(images)
                labels = runner.put_batch(labels)
            m = eval_step(state.params, jnp.asarray(images), jnp.asarray(labels))
            m = jax.device_get(m)
            val_loss += float(m["valid/loss"])
            acc += float(m["valid/acc"])
            n += 1
        val_loss /= max(n, 1)
        acc /= max(n, 1)
        print(f"epoch {epoch}: val_loss={val_loss:.3f}, acc={acc:.3f}")
        logger.log({"valid/loss": val_loss, "valid/acc": acc}, step=int(state.step))
        if acc > best_acc:
            best_acc = acc
            ckpt.save_if_best(state, acc, config=vit_config)

    # rolling "last" so --resume (which restores tag="last") has a target even
    # when the best-acc checkpoint is older
    ckpt.save(state, config=vit_config, tag="last")
    ckpt.save_data_state(int(jax.device_get(state.step)),
                         {"epoch": args.epochs, "next_batch": 0})
    ckpt.finalize()
    logger.close()


if __name__ == '__main__':
    main()
