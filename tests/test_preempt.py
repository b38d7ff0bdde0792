"""Checkpoint-on-SIGTERM: a preempted train script saves 'last' at the
interrupted step and exits cleanly; --resume continues from there."""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _launch(ckpt_dir, extra=()):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1")
    # drop the parent conftest's 8-virtual-device flag: with >1 device the
    # entry points default to a dp mesh, which rejects this tiny batch — the
    # preemption scenario under test is a plain single-device run
    env.pop("XLA_FLAGS", None)
    return subprocess.Popen(
        [sys.executable, "train_titok.py", "--dataset", "synthetic",
         "--transformer", "S", "--image_size", "32", "--patch_size", "8",
         "--latent_tokens", "8", "--codebook_size", "64", "--bs", "4",
         "--epochs", "1", "--steps_per_epoch", "100000", "--log_every", "5",
         "--warmup_steps", "2", "--train_steps", "100000", "--no_wandb",
         "--mixed", "false", "--ckpt_dir", str(ckpt_dir), *extra],
        cwd=ROOT, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)


def test_sigterm_saves_last_and_resume_continues(tmp_path):
    ckpt_dir = tmp_path / "ckpt"
    proc = _launch(ckpt_dir)
    # wait until training has made some steps (first log line appears)
    out_lines = []
    deadline = time.time() + 240
    while time.time() < deadline:
        line = proc.stdout.readline()
        out_lines.append(line)
        if line.startswith("e=0 i=10"):
            break
    else:
        proc.kill()
        raise AssertionError("training never reached step 10:\n"
                             + "".join(out_lines))
    proc.send_signal(signal.SIGTERM)
    rest, _ = proc.communicate(timeout=240)
    out = "".join(out_lines) + rest
    assert proc.returncode == 0, out
    assert "PREEMPTED: saving 'last' at step" in out, out
    meta = json.loads((ckpt_dir / "last_meta.json").read_text())
    assert meta["step"] >= 10

    # resume picks up from the preempted step
    proc2 = _launch(ckpt_dir, extra=("--resume",))
    out2_lines = []
    deadline = time.time() + 240
    resumed_at = None
    while time.time() < deadline:
        line = proc2.stdout.readline()
        out2_lines.append(line)
        if line.startswith("RESUMED at step"):
            resumed_at = int(line.split()[-1])
        if line.startswith("e=0 i=5"):
            break
    proc2.send_signal(signal.SIGTERM)
    proc2.communicate(timeout=240)
    assert resumed_at is not None and resumed_at >= meta["step"], \
        "".join(out2_lines)
