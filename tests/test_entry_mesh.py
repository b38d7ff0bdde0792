"""Entry-point mesh plumbing: the VERDICT r2 done-criterion test.

Launches the REAL ``train_titok.py`` script (the path users run) twice on a virtual
8-device CPU platform — once on a dp=2 x fsdp=2 x tp=2 mesh, once single-device
(--mesh 1,1,1) — and asserts the logged training loss matches at every step. This
pins (a) that ``--mesh`` reaches the CLI, (b) that state/batch shardings + the GSPMD
collectives reproduce single-device numerics (fp32, xla attention), and (c) that the
runs/ JSONL telemetry survives the sharded path.

The reference has no multi-device path at all (SURVEY.md §2c; its one fossil is the
undefined ``gather()`` at /root/reference/blocks.py:457).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
RUN_NAME = "8px_32px_S_16_64"


def _run(tmp_path: Path, mesh: str, tag: str) -> list[dict]:
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"  # honored by vit_tpu.__init__ pre-backend-init
    cwd = tmp_path / tag
    cwd.mkdir()
    env["VIT_TPU_RUN_DIR"] = str(cwd / "runs")
    cmd = [sys.executable, str(REPO / "train_titok.py"),
           "--dataset", "synthetic", "--mesh", mesh, "--bs", "8",
           "--image_size", "32", "--patch_size", "8", "--latent_tokens", "16",
           "--codebook_size", "64", "--transformer", "S", "--n_layers", "2",
           "--mixed", "false",
           "--attn_impl", "xla", "--epochs", "1", "--steps_per_epoch", "3",
           "--log_every", "1", "--image_every", "1000", "--train_steps", "10",
           "--warmup_steps", "2", "--no_wandb", "--ckpt_dir", str(cwd / "ckpt")]
    proc = subprocess.run(cmd, env=env, cwd=cwd, capture_output=True, text=True,
                          timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    jsonl = cwd / "runs" / "titok-synthetic" / f"{RUN_NAME}.jsonl"
    assert jsonl.exists(), f"missing run log {jsonl}"
    return [json.loads(line) for line in jsonl.read_text().splitlines()]


def test_script_mesh_matches_single_device(tmp_path):
    sharded = _run(tmp_path, "2,2,2", "mesh222")
    single = _run(tmp_path, "1,1,1", "single")

    cfg = sharded[0]
    assert cfg.get("_config", {}).get("mesh") == "2,2,2"
    assert "_platform" in cfg

    def losses(rows):
        return [(r["_step"], r["train/loss"]) for r in rows if "train/loss" in r]

    ls, lo = losses(sharded), losses(single)
    assert len(ls) == len(lo) == 3, (ls, lo)
    for (step_s, loss_s), (step_o, loss_o) in zip(ls, lo):
        assert step_s == step_o
        assert abs(loss_s - loss_o) <= 2e-3 * max(abs(loss_o), 1.0), \
            f"step {step_s}: mesh loss {loss_s} vs single {loss_o}"
