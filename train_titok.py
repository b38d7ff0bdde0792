"""TiTok 1-D tokenizer training (TPU-native) — the flagship workload.

CLI-surface parity with the reference train_titok.py:96-113 (same flags/defaults),
plus rebuild-only flags: --dataset synthetic, --perceptual_weights (converted
ConvNeXt-S .npz; absent torchvision/network in this env — see
vit_tpu/losses/perceptual.py), --quantizer fsq (the reference's intended variant),
--vq_impl/--attn_impl kernel selection, --ckpt_dir, --log_every/--image_every.

Deliberate fixes vs the reference (SURVEY.md §2d): grad clip BEFORE the optimizer
update (the reference clips after scaler.step — a no-op, train_titok.py:160-162);
pixel loss keeps the reference's squared-error math (named l1_loss there).
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from vit_tpu.data.synthetic import SyntheticImageLoader
from vit_tpu.models.titok import TiTok, TiTokConfig
from vit_tpu.train.loop import run_tokenizer_training
from vit_tpu.utils.config import str2bool


def parse_args():
    parser = argparse.ArgumentParser()
    # --- reference flag surface (train_titok.py:96-113) ---
    parser.add_argument('--image_size', type=int, default=128)
    parser.add_argument('--patch_size', type=int, default=16)
    parser.add_argument('--latent_tokens', type=int, default=256)
    parser.add_argument('--codebook_size', type=int, default=2048)
    parser.add_argument('--latent_dim', type=int, default=12)
    parser.add_argument('--transformer', type=str, default='B')
    parser.add_argument('--bs', type=int, default=32)
    parser.add_argument('--mixed', type=str2bool, default=True)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--perceptual_weight', type=float, default=1.0)
    parser.add_argument('--weight_decay', type=float, default=1e-4)
    parser.add_argument('--warmup_steps', type=int, default=5000)
    parser.add_argument('--train_steps', type=int, default=1_000_000)
    parser.add_argument('--dataset', type=str, default='imagenet',
                        choices=['imagenet', 'dmlab', 'minecraft', 'synthetic'])
    parser.add_argument('--epochs', type=int, default=100000)
    # --- rebuild-only flags ---
    parser.add_argument('--data_dir', type=str, default=None)
    parser.add_argument('--steps_per_epoch', type=int, default=100)
    parser.add_argument('--max_epoch_steps', type=int, default=0,
                        help='cap batches per epoch for any loader (0 = full '
                             'loader); smoke runs over huge virtual epochs, '
                             'and the per-epoch equalizer for uneven '
                             'multihost streaming shards')
    parser.add_argument('--perceptual_weights', type=str, default=None,
                        help='.npz from scripts/convert_perceptual_weights.py; '
                             '"random" for arch-only init; omit to disable the term')
    parser.add_argument('--perceptual_quant', type=str, default=None,
                        choices=[None, 'int8'],
                        help='int8: run the frozen perceptual net on the '
                             'int8 MXU path (2x bf16 peak); loss semantics '
                             'unchanged (vit_tpu/losses/perceptual.py)')
    parser.add_argument('--quantizer', type=str, default='vq', choices=['vq', 'fsq'])
    parser.add_argument('--attn_impl', type=str, default=None,
                        choices=[None, 'pallas', 'xla'])
    parser.add_argument('--scan_layers', type=str2bool, default=False,
                        help='compile each transformer stack as one lax.scan '
                             'over stacked layer params: ~n_layers-fold '
                             'smaller XLA program (much faster compiles), '
                             'same math (vit_tpu/core/transformer.py)')
    parser.add_argument('--n_layers', type=int, default=None,
                        help='override enc/dec transformer depth (debug & the '
                             'driver multi-chip dryrun; None = preset depth)')
    parser.add_argument('--ckpt_dir', type=str, default='titok_models')
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
    parser.add_argument('--loader_backend', type=str, default='threads',
                        choices=['threads', 'grain'],
                        help='host input-pipeline backend (grain = Google Grain)')
    parser.add_argument('--loader_processes', type=int, default=0,
                        help='grain multiprocess worker count (0 = in-process '
                             'reader threads); only with --loader_backend grain')
    parser.add_argument('--adam_mu_dtype', type=str, default='bfloat16',
                        choices=[None, 'float32', 'bfloat16'],
                        help='AdamW first-moment dtype; bfloat16 halves its HBM '
                             'traffic in the (bandwidth-bound) update')
    parser.add_argument('--profile_dir', type=str, default=None,
                        help='capture a jax.profiler trace of steps 10-15 here')
    args = parser.parse_args()
    args.min_lr = args.lr / 10.0  # reference train_titok.py:114
    return args


def get_loader(args):
    from vit_tpu.train.distributed import host_shard

    shard_id, num_shards = host_shard(args)  # this data-group's slice of the stream
    if args.dataset == 'synthetic':
        return SyntheticImageLoader(args.image_size, args.bs,
                                    steps_per_epoch=args.steps_per_epoch,
                                    seed=args.seed + 9973 * shard_id,
                                    mode='shapes')
    if args.dataset == 'imagenet':
        from vit_tpu.data.imagenet import get_imagenet_loaders

        return get_imagenet_loaders(args.image_size, args.bs,
                                    data_dir=args.data_dir,
                                    backend=getattr(args, 'loader_backend',
                                                    'threads'),
                                    processes=getattr(args, 'loader_processes',
                                                      0),
                                    shard_id=shard_id,
                                    num_shards=num_shards)[0]
    if args.dataset == 'dmlab':
        assert args.image_size == 64  # reference train_titok.py:120
        from vit_tpu.data.video import get_dmlab_image_loaders

        return get_dmlab_image_loaders(args.bs, dataset_path=args.data_dir,
                                       shard_id=shard_id,
                                       num_shards=num_shards)[0]
    if args.dataset == 'minecraft':
        assert args.image_size == 128  # reference train_titok.py:124
        from vit_tpu.data.video import get_minecraft_image_loaders

        return get_minecraft_image_loaders(args.bs, dataset_path=args.data_dir,
                                           shard_id=shard_id,
                                           num_shards=num_shards)[0]
    raise ValueError(args.dataset)


def main():
    from vit_tpu.utils.cache import enable_compilation_cache
    from vit_tpu.train.distributed import pp_from_args
    enable_compilation_cache()
    args = parse_args()
    dtype = jnp.bfloat16 if args.mixed else jnp.float32
    titok_config = TiTokConfig(args.image_size, args.patch_size, args.latent_tokens,
                               args.codebook_size, args.latent_dim, args.transformer,
                               dtype=dtype, attn_impl=args.attn_impl,
                               quantizer=args.quantizer,
                               scan_layers=args.scan_layers,
                               pp_stages=pp_from_args(args),
                               pp_microbatches=args.pp_microbatches)
    if args.n_layers is not None:
        for name in ("enc_vit_config", "dec_vit_config"):
            sub = getattr(titok_config, name)
            sub.trans_config = sub.trans_config.replace(n_layers=args.n_layers)

    project_name = {'imagenet': 'titok', 'dmlab': 'titok-dmlab',
                    'minecraft': 'titok-minecraft',
                    'synthetic': 'titok-synthetic'}[args.dataset]
    run_name = (f"{args.patch_size}px_{args.image_size}px_{args.transformer}_"
                f"{args.latent_tokens}_{args.codebook_size}")

    train_loader = get_loader(args)
    model = TiTok(titok_config)
    run_tokenizer_training(
        args, model, titok_config, train_loader,
        project_name=project_name, run_name=run_name,
        codebook_size=titok_config.codebook_size,
        pixel_loss="l2",  # reference uses squared error here (train_titok.py:155)
    )


if __name__ == '__main__':
    main()
