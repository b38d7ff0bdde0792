"""Export a trained checkpoint for serving (see vit_tpu/serve/export.py).

Tokenizers (encode/decode artifacts):
  python scripts/export_tokenizer.py --ckpt ckpt/titok-flagship-live \
      --out exported/titok --bs 8
  python scripts/export_tokenizer.py --ckpt ... --out ... \
      --platforms tpu --attn_impl pallas   # TPU-only, fused attention

Classifier (predict artifact) / AR prior (generate artifact):
  python scripts/export_tokenizer.py --model vit_classifier --ckpt ... --out ...
  python scripts/export_tokenizer.py --model videogpt --ckpt ... --out ... \
      --cond_frames 8 --gen_frames 8

Serve the result:  python -m vit_tpu.serve.server --dir exported/titok
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TOKENIZERS = ["titok", "vit_vqgan", "enhancing", "tatitok", "llamagen_titok"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", default="titok",
                    choices=TOKENIZERS + ["vit_classifier", "videogpt"])
    ap.add_argument("--bs", type=int, default=1,
                    help="exported batch size; 0 = symbolic (any batch, one "
                    "compile per distinct size at serve time)")
    ap.add_argument("--tag", default="best")
    ap.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    ap.add_argument("--attn_impl", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--cond_frames", type=int, default=8,
                    help="videogpt only: conditioning frames")
    ap.add_argument("--gen_frames", type=int, default=8,
                    help="videogpt only: frames to generate")
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="videogpt only: 0 = greedy (reference); > 0 bakes "
                    "sampled decoding in (artifact gains a scalar seed input)")
    ap.add_argument("--top_k", type=int, default=None,
                    help="videogpt only: restrict sampling to the k best")
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="int8: export the transformer Dense sites as MXU "
                    "int8 matmuls (4x smaller weights, 2x int8 peak on v5e; "
                    "~1%% per-matmul quantization error)")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel serving: lower the artifact over a "
                    "dp-device ('data',) mesh — each request's batch is "
                    "partitioned across dp chips (bs %% dp == 0). The "
                    "artifact then REQUIRES dp devices at serve time.")
    ap.add_argument("--use_ema", action="store_true",
                    help="export the EMA weight average (checkpoints from "
                    "--ema_decay runs) instead of the live params")
    ap.add_argument("--dp_host_cpu", action="store_true",
                    help="trace the --dp export over dp VIRTUAL CPU devices "
                    "(for export hosts with fewer than dp real chips; the "
                    "artifact still targets --platforms). Implies the xla "
                    "attention path.")
    args = ap.parse_args()

    if args.dp_host_cpu:
        # must precede any backend initialization; the env var alone is read
        # too late because sitecustomize imports jax at interpreter startup
        import os

        import jax

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={args.dp}").strip()
        jax.config.update("jax_platforms", "cpu")

    from vit_tpu.serve.export import (export_classifier, export_tokenizer,
                                      export_videogpt)

    common = dict(bs=args.bs, tag=args.tag, platforms=tuple(args.platforms),
                  attn_impl=args.attn_impl, quantize=args.quantize,
                  dp=args.dp, use_ema=args.use_ema)
    if args.model in TOKENIZERS:
        out = export_tokenizer(args.ckpt, args.out, model=args.model, **common)
    elif args.model == "vit_classifier":
        out = export_classifier(args.ckpt, args.out, **common)
    else:
        out = export_videogpt(args.ckpt, args.out,
                              cond_frames=args.cond_frames,
                              gen_frames=args.gen_frames,
                              temperature=args.temperature,
                              top_k=args.top_k, **common)
    for p in sorted(out.iterdir()):
        print(f"{p}  ({p.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
