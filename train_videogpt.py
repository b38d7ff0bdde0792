"""VideoGPT training (TPU-native): frozen TiTok tokenizer → causal AR prior.

CLI-surface parity with the reference train_videogpt.py:72-87 (same flags/defaults),
plus rebuild-only flags: --dataset synthetic, --tokenizer_ckpt (an orbax TiTok
checkpoint dir from train_titok.py, replacing the reference's external
``oned_tokenizer`` TATiTok checkpoint, test_import.py:18-29; "random" gives an
untrained tokenizer for smoke runs).

TPU-native structure: per-frame tokenization of the frozen tokenizer and the AR train
step are ONE jitted program (the reference runs a separate no_grad encode in the loop,
train_videogpt.py:124-127); generation evals use the KV-cache O(n) decoder
(vit_tpu/models/videogpt.py) instead of the reference's O(n²) re-forward.

Deliberate divergence (SURVEY.md §2d quirk 6): video frames are normalized to [0,1]
floats before the tokenizer — the reference feeds raw uint8.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from vit_tpu.data.resume import resume_stream, set_stream_epoch
from vit_tpu.data.synthetic import SyntheticVideoLoader
from vit_tpu.models.titok import TiTok, TiTokConfig
from vit_tpu.models.videogpt import VideoGPT, VideoGPTConfig, generate_frames
from vit_tpu.train.checkpoint import Checkpointer
from vit_tpu.train.optim import make_optimizer
from vit_tpu.train.state import TrainState, params_str
from vit_tpu.utils.logging import MetricsLogger
from vit_tpu.utils.config import str2bool


def parse_args():
    parser = argparse.ArgumentParser()
    # --- reference flag surface (train_videogpt.py:72-87) ---
    parser.add_argument('--frame_size', type=int, default=64)
    parser.add_argument('--codebook_size', type=int, default=1024)
    parser.add_argument('--transformer', type=str, default='B')
    parser.add_argument('--max_frames', type=int, default=16)
    parser.add_argument('--condition_frames', type=int, default=8)
    parser.add_argument('--dropout', type=float, default=0.0)
    parser.add_argument('--bs', type=int, default=32)
    parser.add_argument('--mixed', type=str2bool, default=True)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--weight_decay', type=float, default=1e-4)
    parser.add_argument('--warmup_steps', type=int, default=5000)
    parser.add_argument('--train_steps', type=int, default=500000)
    parser.add_argument('--dataset', type=str, default='dmlab',
                        choices=['dmlab', 'synthetic'])
    parser.add_argument('--epochs', type=int, default=100000)
    # --- rebuild-only flags ---
    parser.add_argument('--data_dir', type=str, default=None)
    parser.add_argument('--tokenizer_ckpt', type=str, default='random',
                        help='orbax TiTok checkpoint dir (train_titok.py --ckpt_dir) '
                             'or "random" for an untrained tokenizer (smoke)')
    parser.add_argument('--image_size', type=int, default=64)
    parser.add_argument('--steps_per_epoch', type=int, default=50)
    parser.add_argument('--attn_impl', type=str, default=None,
                        choices=[None, 'pallas', 'xla'])
    parser.add_argument('--scan_layers', type=str2bool, default=False,
                        help='compile the AR transformer stack as one lax.scan '
                             'over stacked layer params: ~n_layers-fold smaller '
                             'XLA program (much faster compiles), same math; '
                             'the KV-cache rollout works scanned too '
                             '(vit_tpu/core/transformer.py)')
    parser.add_argument('--ckpt_dir', type=str, default='ckpt/videogpt')
    parser.add_argument('--resume', action='store_true')
    parser.add_argument('--log_every', type=int, default=100)
    parser.add_argument('--ckpt_every', type=int, default=250,
                        help='min steps between full checkpoint saves (saves '
                             'move GBs device->host; decoupled from --log_every)')
    parser.add_argument('--gen_every', type=int, default=1000)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--no_wandb', action='store_true')
    parser.add_argument('--run_dir', type=str, default=None,
                        help='metrics/TB/image output root (default: $VIT_TPU_RUN_DIR or runs/)')
    from vit_tpu.train.distributed import add_mesh_args
    add_mesh_args(parser)  # --mesh dp,fsdp,tp (shared across entry points)
    args = parser.parse_args()
    args.min_lr = args.lr / 10.0
    assert args.condition_frames < args.max_frames  # reference train_videogpt.py:89
    return args


def load_tokenizer(args, dtype):
    """Frozen tokenizer as a FrozenTokenizer (TiTok or TATiTok — the reference's
    tokenizer is a Bytedance TATiTok checkpoint, test_import.py:18-29)."""
    import json
    from pathlib import Path

    from vit_tpu.models.pretrained import FrozenTokenizer, get_titok_tokenizer
    from vit_tpu.utils.config import dataclass_from_dict

    if args.tokenizer_ckpt == 'random':
        cfg = TiTokConfig(args.image_size, 8, args.frame_size, args.codebook_size,
                          12, 'S', dtype=dtype, attn_impl=args.attn_impl)
        model = TiTok(cfg)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(123),
            jnp.zeros((1, args.image_size, args.image_size, 3)))["params"]
        return FrozenTokenizer(model, params)
    ckpt_dir = Path(args.tokenizer_ckpt)
    cfg_path = ckpt_dir / "best_config.json"
    if not cfg_path.exists() or "use_l2_norm" in json.loads(cfg_path.read_text()):
        # Bytedance-format dir or a vit_tpu TATiTok checkpoint
        model, params = get_titok_tokenizer(str(ckpt_dir))
        return FrozenTokenizer(model, params)
    cfg = dataclass_from_dict(TiTokConfig, json.loads(cfg_path.read_text()))
    cfg.dtype = dtype
    cfg.__post_init__()
    model = TiTok(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))["params"]
    tx = make_optimizer(1e-4, 1, 10, 1e-5, 0.0)
    state = Checkpointer(str(ckpt_dir)).restore(TrainState.create(params, tx),
                                                tag="best")
    return FrozenTokenizer(model, state.params)


def make_videogpt_train_step(model: VideoGPT, tokenizer):
    """Fused frozen-tokenize + AR CE step (reference loop train_videogpt.py:118-136)."""

    def train_step(state: TrainState, titok_params, videos):
        b, t = videos.shape[0], videos.shape[1]

        def tokenize(v):
            frames = rearrange(v, "b t h w c -> (b t) h w c")
            tok = type(tokenizer)(tokenizer.model, titok_params)
            idx = tok.encode_indices(frames)
            return rearrange(idx, "(b t) n -> b t n", b=b)

        tokens = jax.lax.stop_gradient(tokenize(videos))

        def loss_fn(params):
            _, loss = model.apply({"params": params}, tokens)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, tokens, {"train/loss": loss}

    return train_step


def main():
    from vit_tpu.utils.cache import enable_compilation_cache
    from vit_tpu.train.distributed import pp_from_args
    enable_compilation_cache()
    args = parse_args()
    dtype = jnp.bfloat16 if args.mixed else jnp.float32

    tokenizer = load_tokenizer(args, dtype)
    titok_params = tokenizer.params
    args.frame_size = tokenizer.latent_tokens
    args.codebook_size = tokenizer.codebook_size
    args.image_size = tokenizer.image_size

    videogpt_config = VideoGPTConfig(args.frame_size, args.codebook_size,
                                     args.transformer, args.max_frames, args.dropout,
                                     dtype=dtype, attn_impl=args.attn_impl,
                                     scan_layers=args.scan_layers,
                                     pp_stages=pp_from_args(args),
                                     pp_microbatches=args.pp_microbatches)
    model = VideoGPT(videogpt_config)

    project_name = f"videogpt-{args.dataset}"
    run_name = (f"{args.frame_size}_{args.transformer}_{args.codebook_size}_"
                f"{args.max_frames}frames")
    logger = MetricsLogger(project_name, run_name, config=vars(args),
                           out_dir=args.run_dir,
                           use_wandb=not args.no_wandb)

    from vit_tpu.train.distributed import host_shard

    shard_id, num_shards = host_shard(args)  # this data-group's slice of the stream
    if args.dataset == 'synthetic':
        train_loader = SyntheticVideoLoader(args.bs, frames=args.max_frames * 2,
                                            image_size=args.image_size,
                                            steps_per_epoch=args.steps_per_epoch,
                                            seed=args.seed + 9973 * shard_id)
    else:
        from vit_tpu.data.video import get_dmlab_video_loaders

        train_loader = get_dmlab_video_loaders(args.bs,
                                               dataset_path=args.data_dir,
                                               shard_id=shard_id,
                                               num_shards=num_shards)[0]

    rng = jax.random.PRNGKey(args.seed)
    dummy_tokens = jnp.zeros((1, args.max_frames, args.frame_size), jnp.int32)
    params = jax.jit(model.init)(rng, dummy_tokens)["params"]
    tx = make_optimizer(args.lr, args.warmup_steps, args.train_steps, args.min_lr,
                        args.weight_decay, clip_norm=None)
    state = TrainState.create(params, tx)

    ckpt = Checkpointer(args.ckpt_dir, mode="min")
    start_epoch, skip0, steps0 = 0, 0, 0
    if args.resume and ckpt.can_restore():
        state = ckpt.restore(state)
        print(f"RESUMED at step {int(state.step)}")
        data_rs = ckpt.load_data_state(int(state.step))
        if data_rs:  # restore the input-stream position (vit_tpu/data/resume.py)
            start_epoch, skip0 = int(data_rs["epoch"]), int(data_rs["next_batch"])
            steps0 = int(data_rs.get("consumed", 0))
            set_stream_epoch(train_loader, start_epoch)
            print(f"RESUMED data stream at epoch {start_epoch}, batch {skip0}")

    from vit_tpu.train.distributed import maybe_mesh_runner

    runner = maybe_mesh_runner(args)  # --mesh dp,fsdp,tp; None = single device
    if runner is not None:
        state, st_sh = runner.shard_state(state)
        # frozen tokenizer params shard by the same path rules (fsdp/tp axes)
        titok_params, tok_sh = runner.shard_params(titok_params)
        train_step = runner.jit_step(
            make_videogpt_train_step(model, tokenizer),
            in_specs=(st_sh, tok_sh, "batch"),
            out_specs=(st_sh, "batch", "rep"), donate_argnums=(0,))
    else:
        train_step = jax.jit(make_videogpt_train_step(model, tokenizer),
                             donate_argnums=(0,))

    print(f"STATS: titok_params={params_str(titok_params)}, "
          f"video_gpt_params={params_str(state.params)}")

    steps = steps0
    prev_loss = None
    # full-state saves move GBs device->host; decouple from log cadence
    # (see vit_tpu/train/loop.py)
    ckpt_every = getattr(args, "ckpt_every", None) or 250
    last_ckpt_step = None
    # host-side crop + normalize + async device transfer, issued one batch
    # ahead so the DMA overlaps the previous step (vit_tpu/data/prefetch.py)
    from vit_tpu.data.prefetch import device_prefetch
    from vit_tpu.train.preempt import GracefulShutdown

    shutdown = GracefulShutdown.install()

    # stateless crop stream keyed by (seed, global batch number) so a
    # --resume run replays the exact crops an uninterrupted run would
    # (vit_tpu/data/resume.py — a shared stateful RNG could not be
    # fast-forwarded without knowing each draw's bound)
    crop_idx = [steps0]

    def _prepare(batch):
        videos = np.asarray(batch[0])
        # random temporal crop (reference train_videogpt.py:120-121)
        crop_rng = np.random.default_rng((args.seed, 0xC407, crop_idx[0]))
        crop_idx[0] += 1
        offset = int(crop_rng.integers(
            0, max(videos.shape[1] - args.max_frames, 1)))
        clip = np.asarray(videos[:, offset:offset + args.max_frames],
                          np.float32) / 255.0
        return runner.put_batch(clip) if runner is not None \
            else jnp.asarray(clip)

    for epoch in range(start_epoch, args.epochs):
        skip = skip0 if epoch == start_epoch else 0
        st = time.time()
        for i, clip in enumerate(
                device_prefetch(resume_stream(train_loader, skip), _prepare),
                start=skip):
            load_time = time.time() - st
            is_log = steps % args.log_every == 0
            rebased = is_log and prev_loss is not None
            if rebased:
                # drain the async-dispatch backlog so step_time measures ONE
                # step, not up to log_every queued ones (see train/loop.py)
                float(jax.device_get(prev_loss))
                st = time.time()
            state, tokens, metrics = train_step(state, titok_params, clip)
            prev_loss = metrics["train/loss"]
            if is_log:
                # one device_get round-trip for all logged scalars (see
                # vit_tpu/train/loop.py)
                loss_v, step_now = jax.device_get(
                    (metrics["train/loss"], state.step))
                loss = float(loss_v)
                step_time = time.time() - st - (0.0 if rebased else load_time)
                logger.log({"train/loss": loss, "train/epoch": epoch,
                            "train/steps": steps,
                            "benchmark/load_time": load_time,
                            "benchmark/step_time": step_time},
                           step=int(step_now))
                print(f"e={epoch} s={steps} loss={loss:.3f} "
                      f"step_time={step_time:.3f}")
                if (last_ckpt_step is None
                        or steps - last_ckpt_step >= ckpt_every):
                    ckpt.save_if_best(state, loss, config=videogpt_config)
                    # rolling "last" + input-stream position: crash recovery
                    # via --resume (see vit_tpu/train/loop.py)
                    ckpt.save(state, config=videogpt_config, tag="last")
                    ckpt.save_data_state(int(step_now),
                                         {"epoch": epoch, "next_batch": i + 1,
                                          "consumed": steps + 1})
                    last_ckpt_step = steps
            if steps % args.gen_every == 0 and \
                    getattr(tokens, "is_fully_addressable", True):
                # conditional generation eval (reference train_videogpt.py:141-158)
                # (skipped on multi-host workers: tokens are globally sharded)
                cond = tokens[:2, :args.condition_frames]
                gen_tokens = generate_frames(model, state.params, cond,
                                             args.max_frames - args.condition_frames)
                gen_frames = rearrange(gen_tokens, "b (t n) -> (b t) n",
                                       n=args.frame_size)
                gen_video = tokenizer.decode_indices(gen_frames)
                gen_video = jnp.clip(gen_video, 0.0, 1.0)
                gen_video = rearrange(gen_video, "(b t) h w c -> b h (t w) c", b=2)
                real = rearrange(clip[:2], "b t h w c -> b h (t w) c")
                logger.log_images({"video": jax.device_get(real),
                                   "gen_video": jax.device_get(gen_video)},
                                  step=int(state.step))
            steps += 1
            st = time.time()
            if shutdown.requested:
                # SIGTERM (preemption grace window): persist the exact step
                # and exit cleanly so --resume continues from here.
                step_final = int(jax.device_get(state.step))
                print(f"PREEMPTED: saving 'last' at step {step_final} "
                      "and exiting")
                ckpt.save(state, config=videogpt_config, tag="last")
                ckpt.save_data_state(step_final,
                                     {"epoch": epoch, "next_batch": i + 1,
                                      "consumed": steps})
                ckpt.finalize()
                logger.close()
                return

    # rolling "last" so --resume has the final state even when the best-loss
    # checkpoint is older
    ckpt.save(state, config=videogpt_config, tag="last")
    ckpt.save_data_state(int(jax.device_get(state.step)),
                         {"epoch": args.epochs, "next_batch": 0,
                          "consumed": steps})
    ckpt.finalize()
    logger.close()


if __name__ == '__main__':
    main()
