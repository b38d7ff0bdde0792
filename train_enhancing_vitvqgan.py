""""Enhancing" ViT-VQGAN training (TPU-native).

CLI-surface parity with the reference train_enhancing_vitvqgan.py:275-290 (same
flags/defaults: warmup 10000, train_steps 500k, transformer B hard-coded to ViT-Base
dims), plus the shared rebuild-only flags. Loss shape matches the reference loop
(:328-333): true L1 pixel loss + perceptual + quantize, log cadence 500.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from vit_tpu.data.synthetic import SyntheticImageLoader
from vit_tpu.models.enhancing_vqgan import EnhancingViTVQGAN, EnhancingVQGANConfig
from vit_tpu.train.loop import run_tokenizer_training
from vit_tpu.utils.config import str2bool


def parse_args():
    parser = argparse.ArgumentParser()
    # --- reference flag surface (train_enhancing_vitvqgan.py:275-290) ---
    parser.add_argument('--image_size', type=int, default=128)
    parser.add_argument('--patch_size', type=int, default=16)
    parser.add_argument('--latent_tokens', type=int, default=256)  # accepted, unused
    parser.add_argument('--codebook_size', type=int, default=2048)
    parser.add_argument('--latent_dim', type=int, default=12)
    parser.add_argument('--transformer', type=str, default='B')
    parser.add_argument('--bs', type=int, default=32)
    parser.add_argument('--mixed', type=str2bool, default=True)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--weight_decay', type=float, default=1e-4)
    parser.add_argument('--warmup_steps', type=int, default=10000)
    parser.add_argument('--train_steps', type=int, default=500_000)
    parser.add_argument('--dataset', type=str, default='imagenet',
                        choices=['imagenet', 'synthetic'])
    parser.add_argument('--epochs', type=int, default=100000)
    # --- rebuild-only flags ---
    parser.add_argument('--data_dir', type=str, default=None)
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
    parser.add_argument('--perceptual_weight', type=float, default=1.0)
    parser.add_argument('--attn_impl', type=str, default=None,
                        choices=[None, 'pallas', 'xla'])
    parser.add_argument('--scan_layers', type=str2bool, default=False,
                        help='compile each transformer stack as one lax.scan '
                             'over stacked layer params: ~depth-fold smaller '
                             'XLA program (much faster compiles), same math '
                             '(vit_tpu/models/enhancing_vqgan.py)')
    parser.add_argument('--ckpt_dir', type=str, default='titok_models/enhancing')
    parser.add_argument('--resume', action='store_true')
    parser.add_argument('--ema_decay', type=float, default=0.0,
                        help='Polyak/EMA weight averaging (e.g. 0.999); the '
                        'average rides the checkpoint and can be evaled/'
                        'exported with --use_ema / ema=True')
    parser.add_argument('--log_every', type=int, default=500)
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
    return args


def main():
    from vit_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    args = parse_args()
    dtype = jnp.bfloat16 if args.mixed else jnp.float32
    config = EnhancingVQGANConfig(args.image_size, args.patch_size,
                                  args.codebook_size, args.latent_dim,
                                  args.transformer, dtype=dtype,
                                  attn_impl=args.attn_impl,
                                  scan_layers=args.scan_layers)

    project_name = ('vit-vqgan' if args.dataset == 'imagenet'
                    else 'enhancing-vqgan-synthetic')
    run_name = (f"{args.patch_size}px_{args.image_size}px_{args.transformer}_"
                f"{args.latent_tokens}_{args.codebook_size}")

    from vit_tpu.train.distributed import host_shard

    shard_id, num_shards = host_shard(args)  # this data-group's slice of the stream
    if args.dataset == 'synthetic':
        train_loader = SyntheticImageLoader(args.image_size, args.bs,
                                            steps_per_epoch=args.steps_per_epoch,
                                            seed=args.seed + 9973 * shard_id,
                                            mode='shapes')
    else:
        from vit_tpu.data.imagenet import get_imagenet_loaders

        train_loader = get_imagenet_loaders(args.image_size, args.bs,
                                            data_dir=args.data_dir,
                                            shard_id=shard_id,
                                            num_shards=num_shards)[0]

    model = EnhancingViTVQGAN(config)
    run_tokenizer_training(
        args, model, config, train_loader,
        project_name=project_name, run_name=run_name,
        codebook_size=config.codebook_size,
        pixel_loss="l1",
    )


if __name__ == '__main__':
    main()
