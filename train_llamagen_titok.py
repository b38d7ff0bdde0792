"""LlamaGen-TiTok training: TiTok compression of frozen VQGAN code sequences.

CLI-surface parity with the reference train_llamagen_titok.py:119-136 (same
flags/defaults). The reference's frozen LlamaGen VQ model comes from an external repo
+ checkpoints (train_llamagen_titok.py:140-155); here the frozen code source is
  --vq_ckpt <dir>   a vit_tpu ViT-VQGAN orbax checkpoint (encodes images to codes), or
  --dataset synthetic with no --vq_ckpt: random code sequences (smoke path).

Deliberate fix (SURVEY.md §2d bug 3): the reference's micro-step gradient accumulation
is broken (zero_grad every micro-step + post-backward loss scaling); here accumulation
is optax.MultiSteps — true averaged-gradient accumulation over --micro_steps.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_tpu.data.resume import resume_stream, set_stream_epoch
from vit_tpu.models.llamagen_titok import LlamaGenTiTok, LlamaGenTiTokConfig
from vit_tpu.train.checkpoint import Checkpointer
from vit_tpu.train.optim import make_optimizer
from vit_tpu.train.state import TrainState, params_str
from vit_tpu.utils.logging import MetricsLogger
from vit_tpu.utils.config import str2bool


def parse_args():
    parser = argparse.ArgumentParser()
    # --- reference flag surface (train_llamagen_titok.py:119-136) ---
    parser.add_argument('--vq_codebook_size', type=int, default=16384)
    parser.add_argument('--vq_latent_tokens', type=int, default=256)
    parser.add_argument('--latent_tokens', type=int, default=256)
    parser.add_argument('--codebook_size', type=int, default=16384)
    parser.add_argument('--latent_dim', type=int, default=12)
    parser.add_argument('--transformer', type=str, default='S')
    parser.add_argument('--bs', type=int, default=32)
    parser.add_argument('--micro_steps', type=int, default=1)
    parser.add_argument('--mixed', type=str2bool, default=True)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--perceptual_weight', type=float, default=1.0)  # accepted;
    # the reference accepts it but this workload has no perceptual term (CE loss)
    parser.add_argument('--weight_decay', type=float, default=1e-4)
    parser.add_argument('--warmup_steps', type=int, default=5000)
    parser.add_argument('--train_steps', type=int, default=1_000_000)
    parser.add_argument('--dataset', type=str, default='imagenet',
                        choices=['imagenet', 'synthetic'])
    parser.add_argument('--epochs', type=int, default=100000)
    # --- rebuild-only flags ---
    parser.add_argument('--data_dir', type=str, default=None)
    parser.add_argument('--vq_ckpt', type=str, default=None,
                        help='vit_tpu ViT-VQGAN orbax ckpt dir as the frozen code '
                             'source; omit with --dataset synthetic for random codes')
    parser.add_argument('--steps_per_epoch', type=int, default=100)
    parser.add_argument('--attn_impl', type=str, default=None,
                        choices=[None, 'pallas', 'xla'])
    parser.add_argument('--scan_layers', type=str2bool, default=False,
                        help='compile each transformer stack as one lax.scan over stacked layer params: ~n_layers-fold smaller XLA program (much faster compiles), same math (vit_tpu/core/transformer.py)')
    parser.add_argument('--ckpt_dir', type=str, default='titok_models/llamagen')
    parser.add_argument('--resume', action='store_true')
    parser.add_argument('--log_every', type=int, default=100)
    parser.add_argument('--ckpt_every', type=int, default=250,
                        help='min steps between full checkpoint saves (saves move GBs device->host; decoupled from --log_every)')
    parser.add_argument('--image_every', type=int, default=5000)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--no_wandb', action='store_true')
    parser.add_argument('--run_dir', type=str, default=None,
                        help='metrics/TB/image output root (default: $VIT_TPU_RUN_DIR or runs/)')
    from vit_tpu.train.distributed import add_mesh_args
    add_mesh_args(parser)  # --mesh dp,fsdp,tp (shared across entry points)
    args = parser.parse_args()
    args.min_lr = args.lr / 10.0
    return args


def make_code_loader(args):
    """Yields (codes (B, vq_latent_tokens) int32, decode_fn or None)."""
    if args.vq_ckpt:
        import json
        from pathlib import Path

        ckpt_dir = Path(args.vq_ckpt)
        if ckpt_dir.is_file():
            # External LlamaGen {"model": state_dict} .pt checkpoint
            # (reference train_llamagen_titok.py:140-155) — converted in-process.
            from vit_tpu.models.llamagen_vq import load_llamagen_vq

            vq_model, vq_params = load_llamagen_vq(str(ckpt_dir))

            class _Cfg:
                image_size = 256  # LlamaGen c2i default input resolution
            cfg = _Cfg()
        else:
            from vit_tpu.models.vit_vqgan import ViTVQGAN, ViTVQGANConfig
            from vit_tpu.utils.config import dataclass_from_dict

            cfg = dataclass_from_dict(
                ViTVQGANConfig,
                json.loads((ckpt_dir / "best_config.json").read_text()))
            cfg.__post_init__()
            vq_model = ViTVQGAN(cfg)
            dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
            vq_params = jax.jit(vq_model.init)(jax.random.PRNGKey(0),
                                               dummy)["params"]
            tx = make_optimizer(1e-4, 1, 10, 1e-5, 0.0)
            state = Checkpointer(str(ckpt_dir)).restore(
                TrainState.create(vq_params, tx), tag="best")
            vq_params = state.params
        encode = jax.jit(lambda imgs: vq_model.apply(
            {"params": vq_params}, imgs, method="encode"))
        decode = jax.jit(lambda idx: vq_model.apply(
            {"params": vq_params}, idx, method="decode_indices"))

        from vit_tpu.train.distributed import host_shard

        shard_id, num_shards = host_shard(args)  # this data-group's slice of the stream
        if args.dataset == 'synthetic':
            from vit_tpu.data.synthetic import SyntheticImageLoader

            img_loader = SyntheticImageLoader(cfg.image_size, args.bs,
                                              steps_per_epoch=args.steps_per_epoch,
                                              seed=args.seed + 9973 * shard_id,
                                              mode='shapes')
        else:
            from vit_tpu.data.imagenet import get_imagenet_loaders

            img_loader = get_imagenet_loaders(256, args.bs,
                                              data_dir=args.data_dir,
                                              shard_id=shard_id,
                                              num_shards=num_shards)[0]

        class _CodeStream:
            """Re-iterable frozen-VQ code stream; `.dataset` exposes the inner
            image loader so vit_tpu/data/resume.py can rewind its epoch."""

            def __init__(self, dataset):
                self.dataset = dataset

            def __iter__(self):
                for images, _ in self.dataset:
                    yield encode(jnp.asarray(images)), None

        return _CodeStream(img_loader), decode

    assert args.dataset == 'synthetic', "--vq_ckpt required for real datasets"

    class _SyntheticCodes:
        """Epoch-keyed synthetic code batches (deterministic per (seed, epoch)
        like every other loader — resumable via vit_tpu/data/resume.py)."""

        def __init__(self):
            self._epoch = 0

        def __iter__(self):
            rng = np.random.default_rng((args.seed, self._epoch))
            self._epoch += 1
            for _ in range(args.steps_per_epoch):
                yield jnp.asarray(rng.integers(
                    0, args.vq_codebook_size,
                    (args.bs // args.micro_steps, args.vq_latent_tokens),
                    dtype=np.int32)), None

    return _SyntheticCodes(), None


def main():
    from vit_tpu.utils.cache import enable_compilation_cache
    from vit_tpu.train.distributed import pp_from_args
    enable_compilation_cache()
    args = parse_args()
    dtype = jnp.bfloat16 if args.mixed else jnp.float32
    config = LlamaGenTiTokConfig(args.vq_codebook_size, args.vq_latent_tokens,
                                 args.latent_tokens, args.codebook_size,
                                 args.latent_dim, args.transformer,
                                 dtype=dtype, attn_impl=args.attn_impl,
                                 scan_layers=args.scan_layers,
                                 pp_stages=pp_from_args(args),
                                 pp_microbatches=args.pp_microbatches)

    project_name = ('titok-CE-imagenet' if args.dataset == 'imagenet'
                    else 'titok-CE-synthetic')
    run_name = (f"{args.vq_codebook_size}_{args.vq_latent_tokens}vq_"
                f"{args.transformer}_{args.latent_tokens}_{args.codebook_size}ce_vq")
    logger = MetricsLogger(project_name, run_name, config=vars(args),
                           out_dir=args.run_dir,
                           use_wandb=not args.no_wandb)

    train_loader, decode = make_code_loader(args)

    model = LlamaGenTiTok(config)
    rng = jax.random.PRNGKey(args.seed)
    dummy = jnp.zeros((1, args.vq_latent_tokens), jnp.int32)
    params = jax.jit(model.init)(rng, dummy)["params"]
    tx = make_optimizer(args.lr, args.warmup_steps, args.train_steps, args.min_lr,
                        args.weight_decay, clip_norm=1.0)
    if args.micro_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=args.micro_steps)
    state = TrainState.create(params, tx)

    ckpt = Checkpointer(args.ckpt_dir, mode="min")
    start_epoch, skip0, step0 = 0, 0, 0
    if args.resume and ckpt.can_restore():
        state = ckpt.restore(state)
        print(f"RESUMED at step {int(state.step)}")
        data_rs = ckpt.load_data_state(int(state.step))
        if data_rs:  # restore the input-stream position (vit_tpu/data/resume.py)
            start_epoch, skip0 = int(data_rs["epoch"]), int(data_rs["next_batch"])
            step0 = int(data_rs.get("consumed", 0))
            set_stream_epoch(train_loader, start_epoch)
            print(f"RESUMED data stream at epoch {start_epoch}, batch {skip0}")

    def _train_step(state, codes, usage):
        def loss_fn(params):
            logits, indices, quantize_loss = model.apply({"params": params}, codes,
                                                         False)
            recon_loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, config.vq_codebook_size),
                codes.reshape(-1)).mean()
            return recon_loss + quantize_loss, (indices, recon_loss, quantize_loss)

        (loss, (indices, recon_loss, quantize_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        usage = usage.at[indices.reshape(-1)].set(1.0)
        return state, usage, {"train/loss": loss, "train/recon_loss": recon_loss,
                              "train/quant_loss": quantize_loss,
                              "train/codebook_usage": usage.mean()}, indices

    from vit_tpu.train.distributed import maybe_mesh_runner

    runner = maybe_mesh_runner(args)  # --mesh dp,fsdp,tp; None = single device
    if runner is not None:
        state, st_sh = runner.shard_state(state)
        train_step = runner.jit_step(
            _train_step, in_specs=(st_sh, "batch", "rep"),
            out_specs=(st_sh, "rep", "rep", "batch"))
    else:
        train_step = jax.jit(_train_step)

    print(f"STATS: enc_params={params_str(state.params)}")

    from vit_tpu.train.preempt import GracefulShutdown

    shutdown = GracefulShutdown.install()
    best_recon = float('inf')
    usage = jnp.zeros((config.codebook_size,), jnp.float32)
    step = step0
    prev_loss = None
    for epoch in range(start_epoch, args.epochs):
        skip = skip0 if epoch == start_epoch else 0
        st = time.time()
        for i, (codes, _) in enumerate(resume_stream(train_loader, skip),
                                       start=skip):
            if runner is not None:
                codes = runner.put_batch(codes)
            load_time = time.time() - st
            is_log = step % args.log_every == 0
            rebased = is_log and prev_loss is not None
            if rebased:
                # drain the async-dispatch backlog so step_time measures ONE
                # step, not up to log_every queued ones (see train/loop.py)
                float(jax.device_get(prev_loss))
                st = time.time()
            state, usage, metrics, indices = train_step(state, codes, usage)
            prev_loss = metrics["train/loss"]
            if is_log:
                host = {k: float(jax.device_get(v)) for k, v in metrics.items()}
                step_time = time.time() - st - (0.0 if rebased else load_time)
                host.update({"train/epoch": epoch,
                             "benchmark/load_time": load_time,
                             "benchmark/step_time": step_time})
                logger.log(host, step=int(jax.device_get(state.step)))
                print(f"e={epoch} s={step} loss={host['train/loss']:.3f} "
                      f"recon={host['train/recon_loss']:.3f} "
                      f"usage={host['train/codebook_usage']:.3f} "
                      f"step_time={step_time:.3f}")
                if host["train/recon_loss"] < best_recon:
                    best_recon = host["train/recon_loss"]
                    ckpt.save_if_best(state, host["train/recon_loss"], config=config)
                    # rolling "last" + input-stream position: crash recovery
                    # via --resume (see vit_tpu/train/loop.py)
                    ckpt.save(state, config=config, tag="last")
                    ckpt.save_data_state(int(jax.device_get(state.step)),
                                         {"epoch": epoch, "next_batch": i + 1,
                                          "consumed": step + 1})
            if step % args.image_every == 0 and decode is not None and \
                    getattr(codes, "is_fully_addressable", True):
                logits, _, _ = model.apply({"params": state.params}, codes)
                pred_codes = jnp.argmax(logits, axis=-1)
                # device_get before decode: the frozen VQ params live on the
                # default device, mixing them with mesh-sharded codes in one
                # dispatch would raise a committed-devices conflict
                head = jnp.asarray(jax.device_get(codes[:4]))
                pred = jnp.asarray(jax.device_get(pred_codes[:4]))
                logger.log_images(
                    {"reconstructions": jax.device_get(decode(head)),
                     "ce_reconstructions": jax.device_get(decode(pred))},
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
                ckpt.save(state, config=config, tag="last")
                ckpt.save_data_state(step_final,
                                     {"epoch": epoch, "next_batch": i + 1,
                                      "consumed": step})
                ckpt.finalize()
                logger.close()
                return

    ckpt.save(state, config=config, tag="last")
    ckpt.save_data_state(int(jax.device_get(state.step)),
                         {"epoch": args.epochs, "next_batch": 0,
                          "consumed": step})
    ckpt.finalize()
    logger.close()


if __name__ == '__main__':
    main()
