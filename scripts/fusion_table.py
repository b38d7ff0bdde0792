"""Per-fusion attribution table for the flagship step (VERDICT r4 next #1).

Input: an ``hlo_stats.json`` written by scripts/analyze_profile.py from a
``bench.py --profile_dir`` trace. Output: a grouped table of every op-group
≥ ``--min_ms`` with (signature, ms/step, count, achieved TF/s, GiB/s, class,
envelope, pool_ms) printed as markdown and written as JSON — the artifact
bench.py reads to COMPUTE ``open_software_pools_ms_per_step`` instead of
asserting it.

Classes and envelopes:

- ``gemm``: XLA "convolution fusion" groups whose model-FLOP rate exceeds
  20 TF/s (matmul-bearing). Envelope = the 98th-percentile time-weighted rate
  ACROSS THE STEP'S OWN GEMM FUSIONS (self-calibrating: the best fusions in
  this very trace prove what the chip sustains — 189 TF/s on the qkv
  projection — so a straggler's gap to that is software, not silicon).
  pool_ms = ms · (1 − rate/envelope) for groups below 90% of envelope.
- ``attention``: the Pallas attention custom-calls. Envelope = envelope/2
  (K = 64 head_dim fills half the 128-wide MXU contraction lanes).
- ``convnext-pallas``: the fused ConvNeXt block custom-calls — VPU
  depthwise-bound, measured at the ALU floor in round 4 (bench_vpu.py);
  pool 0, closed.
- ``stream``: loop fusions / data formatting / copies — HBM-bandwidth class,
  at the stream floor per the round-4 LN/copy probe; pool 0, closed.

The resulting open-pool sum is the checkable arithmetic the 3x-contract
discussion rests on (BENCHMARKS.md round-5).
"""

from __future__ import annotations

import argparse
import json
import re
from collections import defaultdict


def load_rows(path: str):
    d = json.load(open(path))
    cols = [c["id"] for c in d["cols"]]
    return [dict(zip(cols, [(c or {}).get("v") for c in r["c"]]))
            for r in d["rows"]]


def signature(r):
    expr = r.get("hlo_op_expression") or ""
    m = re.match(r"%\S+ = (.*?) (fusion|custom-call|copy)\(", expr)
    out = m.group(1) if m else expr[:48]
    out = re.sub(r"\{[^}]*\}", "", out)  # strip layout annotations
    name = re.sub(r"\.\d+", "", r.get("hlo_op_name") or "?")
    name = re.sub(r"_block\d+", "_block*", name)
    return f"{r.get('category')}|{name}|{out}"


def classify(sig: str, tf: float) -> str:
    cat, name, _ = sig.split("|", 2)
    if name.startswith("attn"):
        return "attention"
    if name.startswith(("stage", "dwconv")):
        return "convnext-pallas"
    if cat == "convolution fusion" and tf > 20.0:
        return "gemm"
    return "stream"


def build_table(rows, steps: float, min_ms: float):
    groups = defaultdict(lambda: dict(ms=0.0, gflops=0.0, n=0, bw=0.0, bwt=0.0))
    for r in rows:
        t_us = float(r.get("total_self_time") or 0)
        if t_us <= 0:
            continue
        g = groups[signature(r)]
        g["ms"] += t_us / 1000.0 / steps
        g["gflops"] += float(r.get("model_flop_rate") or 0) * t_us / 1e6 / steps
        g["bw"] += float(r.get("measured_memory_bw") or 0) * t_us
        g["bwt"] += t_us
        g["n"] += int(r.get("occurrences") or 0)

    entries = []
    for sig, g in groups.items():
        tf = g["gflops"] / g["ms"] / 1000.0 * 1000.0 if g["ms"] else 0.0
        tf = g["gflops"] / g["ms"] if g["ms"] else 0.0  # GFLOP/ms == TF/s
        entries.append(dict(signature=sig, ms_per_step=g["ms"],
                            count=g["n"] / steps, tf_per_s=tf,
                            gib_per_s=(g["bw"] / g["bwt"]) if g["bwt"] else 0.0,
                            cls=classify(sig, tf)))

    # self-calibrated GEMM envelope: 98th-percentile time-weighted rate
    gemm = sorted((e for e in entries if e["cls"] == "gemm"),
                  key=lambda e: e["tf_per_s"])
    total_gemm_ms = sum(e["ms_per_step"] for e in gemm)
    acc, envelope = 0.0, 0.0
    for e in gemm:
        acc += e["ms_per_step"]
        if acc >= 0.98 * total_gemm_ms:
            envelope = e["tf_per_s"]
            break
    envelope = envelope or max((e["tf_per_s"] for e in gemm), default=0.0)

    for e in entries:
        if e["cls"] == "gemm":
            e["envelope_tf"] = envelope
            below = e["tf_per_s"] < 0.9 * envelope
            e["pool_ms"] = (e["ms_per_step"] * (1 - e["tf_per_s"] / envelope)
                            if below else 0.0)
        elif e["cls"] == "attention":
            e["envelope_tf"] = envelope / 2.0  # K=64 half-lane ceiling
            e["pool_ms"] = max(0.0, e["ms_per_step"]
                               * (1 - e["tf_per_s"] / e["envelope_tf"]))
        else:
            e["envelope_tf"] = None
            e["pool_ms"] = 0.0  # VPU/stream floor, closed round 4

    entries.sort(key=lambda e: -e["ms_per_step"])
    big = [e for e in entries if e["ms_per_step"] >= min_ms]
    rest_ms = sum(e["ms_per_step"] for e in entries) - \
        sum(e["ms_per_step"] for e in big)
    return big, rest_ms, envelope


def main():
    p = argparse.ArgumentParser()
    p.add_argument("hlo_stats", help="hlo_stats.json from analyze_profile.py")
    p.add_argument("--steps", type=float, default=3.0,
                   help="steps captured in the trace (bench.py traces 3)")
    p.add_argument("--min_ms", type=float, default=0.5)
    p.add_argument("--out", type=str, default="benchdata/fusion_table.json")
    p.add_argument("--note", type=str, default="")
    args = p.parse_args()

    rows = load_rows(args.hlo_stats)
    big, rest_ms, envelope = build_table(rows, args.steps, args.min_ms)
    total = sum(e["ms_per_step"] for e in big) + rest_ms
    pools = {e["signature"]: round(e["pool_ms"], 2)
             for e in big if e["pool_ms"] >= 0.25}

    print(f"| ms/step | × | TF/s | GiB/s | class | pool ms | signature |")
    print("|---|---|---|---|---|---|---|")
    for e in big:
        print(f"| {e['ms_per_step']:.2f} | {e['count']:.0f} "
              f"| {e['tf_per_s']:.1f} | {e['gib_per_s']:.0f} | {e['cls']} "
              f"| {e['pool_ms']:.2f} | `{e['signature'][:90]}` |")
    print(f"| {rest_ms:.2f} |  |  |  | (groups < {args.min_ms} ms) | 0 |  |")
    print(f"\ntotal device self time: {total:.1f} ms/step; "
          f"self-calibrated GEMM envelope: {envelope:.1f} TF/s")
    print(f"open pool sum: {sum(pools.values()):.1f} ms/step over "
          f"{len(pools)} groups")

    import os
    import subprocess
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    json.dump({"note": args.note, "git": head,
               "gemm_envelope_tf_per_s": round(envelope, 1),
               "total_device_ms_per_step": round(total, 1),
               "open_pools_ms_per_step": pools,
               "entries": [{k: (round(v, 3) if isinstance(v, float) else v)
                            for k, v in e.items()} for e in big]},
              open(args.out, "w"), indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
