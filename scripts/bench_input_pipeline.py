"""Input-pipeline throughput: streaming WDS reader vs the flagship step budget.

Writes synthetic 256×256 JPEG shards, then measures images/sec of
  (a) the streaming reader + native C++ batch decoder,
  (b) the streaming reader + PIL per-sample path,
  (c) the map-style in-memory reader (smoke-scale baseline),
and reports the implied benchmark/load_time as a fraction of the flagship
TiTok-B step_time ("keeps the chip fed" check, VERDICT r1 weak #8).

Usage: python scripts/bench_input_pipeline.py [--images 2048] [--bs 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", type=int, default=2048)
    parser.add_argument("--bs", type=int, default=64)
    parser.add_argument("--image_size", type=int, default=128,
                        help="output size (flagship TiTok trains at 128)")
    parser.add_argument("--src_size", type=int, default=256)
    parser.add_argument("--step_time_ms", type=float, default=292.0,
                        help="flagship TiTok-B bs64 step time for the ratio")
    args = parser.parse_args()

    from PIL import Image

    from vit_tpu.data.loader import DataLoader
    from vit_tpu.data.wds import (ShardWriter, WdsImageClassification,
                                  streaming_image_loader)

    tmp = tempfile.mkdtemp(prefix="wds_bench_")
    rng = np.random.default_rng(0)
    with ShardWriter(str(Path(tmp) / "shard-%04d.tar"), maxcount=256) as w:
        for i in range(args.images):
            img = Image.fromarray(rng.integers(
                0, 255, (args.src_size, args.src_size, 3), dtype=np.uint8))
            w.write({"__key__": f"{i:07d}", "jpg": img, "cls": i % 10})
        paths = list(w.paths)

    def measure(make_loader, name):
        loader = make_loader()
        # First epoch warms OS page cache + pools; the SECOND epoch is timed
        # from iterator creation to exhaustion, so every sample's decode falls
        # inside the window. (Skipping a "warmup batch" inside the timed epoch
        # — the previous methodology — let the prefetch threads bank decoded
        # batches outside the window and inflated small-epoch numbers.)
        for _ in iter(loader):
            pass
        n = 0
        t0 = time.perf_counter()
        for images, labels in iter(loader):
            n += images.shape[0]
        t = time.perf_counter() - t0
        ips = n / t
        load_ms = args.bs / ips * 1e3
        print(json.dumps({
            "pipeline": name, "images_per_sec": round(ips, 1),
            "load_time_ms_per_step": round(load_ms, 2),
            "fraction_of_step": round(load_ms / args.step_time_ms, 3),
        }))
        return ips

    import os

    from vit_tpu.data.wds import StreamingWebDataset

    # reader-only throughput (raw bytes, no decode): isolates the streaming
    # machinery from the host's JPEG-decode capacity (this dev VM has nproc=1 —
    # decode, not the reader, caps ingest here; both decode paths scale with
    # host cores on a real TPU-VM host).
    ds = StreamingWebDataset(paths, shuffle_buffer=1000, workers=4, decode=False,
                             transform=lambda s: len(s["jpg"]))
    it = iter(ds)
    next(it)
    t0 = time.perf_counter()
    n = sum(1 for _ in it)
    dt = time.perf_counter() - t0
    print(json.dumps({"pipeline": "reader-only (no decode)",
                      "samples_per_sec": round(n / dt, 1),
                      "ms_per_sample": round(1e3 * dt / n, 4),
                      "host_cores": os.cpu_count()}))

    measure(lambda: streaming_image_loader(paths, args.image_size, args.bs,
                                           native=True, workers=8),
            "streaming+native")
    measure(lambda: streaming_image_loader(paths, args.image_size, args.bs,
                                           native=False, workers=8),
            "streaming+pil")
    measure(lambda: DataLoader(
        WdsImageClassification(paths, args.image_size, train=True), args.bs),
        "map+pil (in-memory)")

    # ImageFolder path (the reference's actual loader shape, datasets.py:7-28):
    # threaded loader (native C++ decode when built) vs Grain in-process vs
    # Grain multiprocess workers.
    folder = Path(tmp) / "imagenet" / "train"
    d = folder / "class0"
    d.mkdir(parents=True)
    for i in range(args.images):
        img = Image.fromarray(rng.integers(
            0, 255, (args.src_size, args.src_size, 3), dtype=np.uint8))
        img.save(d / f"img{i:05d}.jpeg")
    (folder.parent / "val" / "class0").mkdir(parents=True)
    img.save(folder.parent / "val" / "class0" / "img0.jpeg")

    from vit_tpu.data.grain_loader import grain_available
    from vit_tpu.data.imagenet import get_imagenet_loaders

    root = str(folder.parent)
    measure(lambda: get_imagenet_loaders(args.image_size, args.bs,
                                         data_dir=root)[0],
            "imagefolder+threads (native auto)")
    measure(lambda: get_imagenet_loaders(args.image_size, args.bs,
                                         data_dir=root, use_native="never")[0],
            "imagefolder+threads (pil)")
    if grain_available():
        measure(lambda: get_imagenet_loaders(args.image_size, args.bs,
                                             data_dir=root,
                                             backend="grain")[0],
                "imagefolder+grain (in-process)")
        measure(lambda: get_imagenet_loaders(args.image_size, args.bs,
                                             data_dir=root, backend="grain",
                                             processes=2)[0],
                "imagefolder+grain (2 procs)")


if __name__ == "__main__":
    main()
