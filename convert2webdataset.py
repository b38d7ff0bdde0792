"""Offline dataset → WebDataset tar shard converter
(capability parity with reference convert2webdaset.py:32-170).

Modes (reference :145-168):
  --dataset imagenet          folder ImageNet → jpg+cls shards (:32-60)
  --dataset dmlab|minecraft|ucf --mode video
                              video clips → sequence.npy tensor shards with
                              stack_frames/keep_every striding + 90/10 split (:62-96)
  --dataset ... --mode image  side-by-side frame strips as jpg (:98-129)

Clip tensors are stored as .npy (np arrays) rather than torch .pth; the reader
(vit_tpu/data/wds.py) also decodes .pth shards written by the reference tool.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from vit_tpu.data.wds import ShardWriter


def get_video_dataset(args):
    from vit_tpu.data.video import DmlabDataset, MinecraftDataset, UCF101Dataset

    if args.dataset == "dmlab":
        return DmlabDataset(args.data_dir)
    if args.dataset == "minecraft":
        return MinecraftDataset(args.data_dir)
    if args.dataset == "ucf":
        return UCF101Dataset(args.data_dir)
    raise ValueError(args.dataset)


def convert_imagenet(args):
    """Folder ImageNet → jpg shards (reference :32-60; source differs: the reference
    streams HF imagenet-1k, this reads the on-disk folder layout)."""
    from PIL import Image

    for split in ("train", "val"):
        root = Path(args.data_dir) / split
        if not root.is_dir():
            print(f"skip {split}: {root} not found")
            continue
        classes = sorted(d.name for d in root.iterdir() if d.is_dir())
        cls_idx = {c: i for i, c in enumerate(classes)}
        pattern = str(Path(args.output_dir) / f"imagenet-{split}-%06d.tar")
        maxcount = (args.max_train_samples_per_shard if split == "train"
                    else args.max_val_samples_per_shard)
        with ShardWriter(pattern, maxcount=maxcount) as writer:
            i = 0
            for c in classes:
                for f in sorted((root / c).iterdir()):
                    img = Image.open(f).convert("RGB")
                    writer.write({"__key__": "%08d" % i, "jpg": img,
                                  "cls": cls_idx[c]})
                    i += 1
        print(f"wrote {i} {split} examples")


def convert_video_dataset_to_video_wds(args):
    """Strided clips → sequence tensor shards + 90/10 split (reference :62-96)."""
    dataset = get_video_dataset(args)
    out = Path(args.output_dir)
    train_w = ShardWriter(str(out / f"{args.dataset}-train-%06d.tar"),
                          maxcount=args.max_train_samples_per_shard)
    val_w = ShardWriter(str(out / f"{args.dataset}-val-%06d.tar"),
                        maxcount=args.max_val_samples_per_shard)
    n_train = n_val = 0
    for video_i in range(len(dataset)):
        video, label = dataset[video_i]
        video = np.asarray(video)
        span = args.stack_frames * args.keep_every
        for start in range(0, video.shape[0] - span + 1, span):
            clip = video[start:start + span:args.keep_every]
            sample = {"__key__": f"{video_i:06d}_{start:06d}",
                      "sequence.npy": clip,
                      "cls": int(label) if np.ndim(label) == 0 else 0}
            if video_i % 10 == 9:           # 90/10 split by video (reference :71-75)
                val_w.write(sample)
                n_val += 1
            else:
                train_w.write(sample)
                n_train += 1
    train_w.close()
    val_w.close()
    print(f"wrote {n_train} train / {n_val} val clips")


def convert_video_dataset_to_image_wds(args):
    """Side-by-side frame strips as jpgs (reference :98-129)."""
    dataset = get_video_dataset(args)
    out = Path(args.output_dir)
    with ShardWriter(str(out / f"{args.dataset}-frames-%06d.tar"),
                     maxcount=args.max_train_samples_per_shard) as writer:
        n = 0
        for video_i in range(len(dataset)):
            video, label = dataset[video_i]
            video = np.asarray(video)
            span = args.stack_frames * args.keep_every
            for start in range(0, video.shape[0] - span + 1, span):
                clip = video[start:start + span:args.keep_every]
                strip = np.concatenate(list(clip), axis=1)  # side-by-side
                writer.write({"__key__": f"{video_i:06d}_{start:06d}",
                              "jpg": strip.astype(np.uint8),
                              "cls": int(label) if np.ndim(label) == 0 else 0})
                n += 1
    print(f"wrote {n} frame strips")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True,
                        choices=["imagenet", "dmlab", "minecraft", "ucf"])
    parser.add_argument("--mode", type=str, default="video",
                        choices=["video", "image"])
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--stack_frames", type=int, default=32)
    parser.add_argument("--keep_every", type=int, default=1)
    parser.add_argument("--max_train_samples_per_shard", type=int, default=10000)
    parser.add_argument("--max_val_samples_per_shard", type=int, default=10000)
    args = parser.parse_args()
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)

    if args.dataset == "imagenet":
        convert_imagenet(args)
    elif args.mode == "video":
        convert_video_dataset_to_video_wds(args)
    else:
        convert_video_dataset_to_image_wds(args)


if __name__ == "__main__":
    main()
