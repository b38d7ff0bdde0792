"""Local grid-sweep runner for wandb-format sweep YAMLs.

The reference drives sweeps through the wandb agent (scripts/*.yaml `command:` blocks,
e.g. scripts/vit_sweep.yaml:27-30). wandb is absent in this image, so this runner
expands the same YAML grids locally, executes each configuration, reads the target
metric back from the run's JSONL (vit_tpu/utils/logging.py), and reports the best.
The YAMLs stay wandb-compatible — with wandb installed, `wandb sweep <yaml>` works
unchanged.

Usage: python scripts/sweep.py sweeps/vit_sweep.yaml [--dry_run] [extra args passed through]
"""

from __future__ import annotations

import argparse
import os
import itertools
import json
import subprocess
import sys
from pathlib import Path

import yaml


def expand_grid(parameters: dict):
    keys, value_lists = [], []
    for key, spec in parameters.items():
        keys.append(key)
        value_lists.append(spec["values"] if "values" in spec else [spec["value"]])
    for combo in itertools.product(*value_lists):
        yield dict(zip(keys, combo))


def build_command(sweep: dict, combo: dict, extra_args):
    args_flat = []
    for k, v in combo.items():
        args_flat += [f"--{k}", str(v)]
    cmd = []
    for part in sweep.get("command", ["python", "${program}", "${args}"]):
        if part == "${program}":
            cmd.append(sweep["program"])
        elif part == "${args}":
            cmd += args_flat
        elif part == "python":
            cmd.append(sys.executable)
        else:
            cmd.append(str(part).strip())
    return cmd + list(extra_args)


def last_metric(jsonl_dir: Path, metric: str, since: float = 0.0):
    """Last value of `metric` across run JSONLs modified after `since`."""
    value = None
    if not jsonl_dir.exists():
        return None
    for path in jsonl_dir.rglob("*.jsonl"):
        if path.stat().st_mtime < since:
            continue
        for line in path.read_text().splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if metric in rec:
                value = rec[metric]
    return value


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("sweep_yaml", type=str)
    parser.add_argument("--dry_run", action="store_true")
    parser.add_argument(
        "--runs_dir", type=str,
        default=os.environ.get("VIT_TPU_RUN_DIR") or "runs",
        help="where the child train scripts write their JSONL metrics "
             "(follows $VIT_TPU_RUN_DIR so sweep metric collection and "
             "the trainers' --run_dir default stay in sync)")
    args, extra = parser.parse_known_args()
    args.extra_args = extra           # anything unrecognized passes through

    sweep = yaml.safe_load(Path(args.sweep_yaml).read_text())
    metric = sweep["metric"]["name"]
    goal = sweep["metric"]["goal"]
    combos = list(expand_grid(sweep["parameters"]))
    print(f"sweep: {len(combos)} configurations, optimizing {metric} ({goal})")

    results = []
    for i, combo in enumerate(combos):
        cmd = build_command(sweep, combo, ["--no_wandb"] + args.extra_args)
        print(f"[{i + 1}/{len(combos)}] {' '.join(cmd)}")
        if args.dry_run:
            continue
        import time

        t0 = time.time()
        res = subprocess.run(cmd)
        value = last_metric(Path(args.runs_dir), metric, since=t0 - 1)
        results.append((combo, value, res.returncode))
        print(f"    -> {metric}={value} (exit {res.returncode})")

    if results:
        valid = [(c, v) for c, v, rc in results if v is not None and rc == 0]
        if valid:
            best = (min if goal == "minimize" else max)(valid, key=lambda cv: cv[1])
            print(f"BEST: {metric}={best[1]} with {best[0]}")


if __name__ == "__main__":
    main()
