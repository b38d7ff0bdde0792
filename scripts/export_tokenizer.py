"""Export a trained tokenizer checkpoint for serving (see vit_tpu/serve/export.py).

  python scripts/export_tokenizer.py --ckpt ckpt/titok-flagship-live \
      --out exported/titok --bs 8
  python scripts/export_tokenizer.py --ckpt ... --out ... \
      --platforms tpu --attn_impl pallas   # TPU-only, fused attention
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", default="titok", choices=["titok", "vit_vqgan"])
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--tag", default="best")
    ap.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    ap.add_argument("--attn_impl", default="xla", choices=["xla", "pallas"])
    args = ap.parse_args()

    from vit_tpu.serve.export import export_tokenizer

    out = export_tokenizer(args.ckpt, args.out, model=args.model, bs=args.bs,
                           tag=args.tag, platforms=tuple(args.platforms),
                           attn_impl=args.attn_impl)
    for p in sorted(out.iterdir()):
        print(f"{p}  ({p.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
