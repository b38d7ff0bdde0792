"""Convert a jax.profiler trace directory to hlo_stats / framework_op_stats CSVs.

Usage: python scripts/analyze_profile.py /tmp/trace_dir [outdir]
Writes <tool>.csv into outdir (default /tmp) and prints the top ops by self time.
"""

from __future__ import annotations

import csv
import glob
import io
import sys
from collections import defaultdict


def main():
    trace_dir, outdir = sys.argv[1], (sys.argv[2] if len(sys.argv) > 2 else "/tmp")
    files = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    assert files, f"no xplane.pb under {trace_dir}"
    files = files[-1:]  # latest capture

    from xprof.convert import raw_to_tool_data as rtd

    import json

    params = {"use_saved_result": False}
    data, _ = rtd.xspace_to_tool_data(files, "hlo_stats", params)
    if isinstance(data, bytes):
        data = data.decode()
    out = f"{outdir}/hlo_stats.json"
    with open(out, "w") as f:
        f.write(data)
    print(f"wrote {out}")

    gviz = json.loads(data)
    cols = [c["id"] for c in gviz["cols"]]
    rows = [dict(zip(cols, [(c or {}).get("v") for c in r["c"]]))
            for r in gviz["rows"]]
    if not rows:
        return

    by_cat = defaultdict(float)
    total = 0.0
    for r in rows:
        t = float(r.get("total_self_time") or 0)
        total += t
        by_cat[r.get("category") or "?"] += t
    print(f"\ntotal device self time: {total/1e3:.2f} ms  (across captured steps)")
    print("\nby category:")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {t/1e3:9.2f} ms  {100*t/total:5.1f}%  {cat}")
    print("\ntop 40 ops by self time:")
    for r in sorted(rows, key=lambda r: -float(r.get("total_self_time") or 0))[:40]:
        t = float(r.get("total_self_time") or 0)
        n = int(r.get("occurrences") or 0)
        label = (r.get("hlo_op_name") or "")[:48]
        expr = (r.get("hlo_op_expression") or "")[:110]
        print(f"  {t/1e3:8.2f} ms ×{n:4d}  {label}  |  {expr}")


if __name__ == "__main__":
    main()
