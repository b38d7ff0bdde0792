"""Multi-host (multi-process) training smoke through the REAL entry point.

Launches N=2 worker processes on localhost (each a separate JAX process with its own
4-device virtual CPU platform), each running ``train_titok.py --mesh ...`` — the
same command a user runs on a real multi-host TPU pod — with the multi-host bring-up
driven entirely by the shared env-var contract in vit_tpu/train/distributed.py:

    JAX_COORDINATOR=127.0.0.1:<port>  JAX_NUM_PROCESSES=2  JAX_PROCESS_ID=<i>

Two arms:

  1. ``--mesh 2,2,2`` — one global dp=2 x fsdp=2 x tp=2 mesh over 8 devices
     spanning both processes: jax.distributed bring-up, global batch assembly
     from per-process shards (``MeshRunner.put_batch`` →
     ``make_array_from_process_local_data``), GSPMD collectives across the
     process boundary, proc-0-only logging, collective orbax checkpoint save.
  2. ``--mesh 4,1,1,2`` — dp=4 x pipe=2 with the OUTERMOST pipe axis split
     across the two processes (jax.devices() orders by process, and
     parallel/mesh.py reshapes (pp, dp, fsdp, tp)), so pipeline stage 0 lives
     entirely on worker 0's devices and stage 1 on worker 1's: every
     stage→stage activation handoff (the collective-permute from jnp.roll in
     core/transformer.py:_pipeline) crosses the process boundary — the
     "pipe rides DCN" placement claim of docs/PARALLELISM.md, executed.

This is the bring-up recipe for a real Cloud TPU pod: same command per host with
JAX_COORDINATOR=auto (metadata auto-detection) and real chips instead of the
virtual CPU platform.

    python scripts/multihost_smoke.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
N_PROC = 2
DEVICES_PER_PROC = 4
PORT = 9723


def run_arm(mesh: str, port: int, extra_args=()) -> int:
    tmp = tempfile.mkdtemp(prefix="multihost_smoke_")
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ)
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append(
            f"--xla_force_host_platform_device_count={DEVICES_PER_PROC}")
        env["XLA_FLAGS"] = " ".join(flags)
        env["JAX_PLATFORMS"] = "cpu"
        env["VIT_TPU_RUN_DIR"] = os.path.join(tmp, "runs")
        env["JAX_COORDINATOR"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(N_PROC)
        env["JAX_PROCESS_ID"] = str(pid)
        cmd = [sys.executable, str(REPO / "train_titok.py"),
               "--dataset", "synthetic", "--mesh", mesh,
               # --bs is per process; global batch = 4 x 2 = 8
               "--bs", "4", "--image_size", "32", "--patch_size", "8",
               "--latent_tokens", "16", "--codebook_size", "64",
               "--transformer", "S", "--n_layers", "2", "--mixed", "false",
               "--attn_impl", "xla", "--epochs", "1", "--steps_per_epoch", "2",
               "--log_every", "1", "--image_every", "1000", "--train_steps", "10",
               "--warmup_steps", "2", "--no_wandb",
               "--ckpt_dir", os.path.join(tmp, "ckpt")] + list(extra_args)
        procs.append(subprocess.Popen(cmd, env=env, cwd=tmp,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    rc = 0
    for pid, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=900)
        tail = "\n".join(out.strip().splitlines()[-4:])
        print(f"--- worker {pid} (rc={proc.returncode}) ---\n{tail}")
        rc |= proc.returncode

    jsonl = Path(tmp) / "runs" / "titok-synthetic" / "8px_32px_S_16_64.jsonl"
    if rc == 0:
        rows = [json.loads(line) for line in jsonl.read_text().splitlines()]
        losses = [r["train/loss"] for r in rows if "train/loss" in r]
        assert losses and all(x == x for x in losses), losses
        ckpt_ok = (Path(tmp) / "ckpt" / "last").exists()
        print(f"multihost smoke OK: 2 procs x 4 devices, mesh {mesh}, "
              f"losses={[round(x, 4) for x in losses]}, "
              f"collective_ckpt={'yes' if ckpt_ok else 'MISSING'}")
        if not ckpt_ok:
            rc = 1
    return rc


def launch() -> int:
    rc = run_arm("2,2,2", PORT)
    if rc == 0:
        rc = run_arm("4,1,1,2", PORT + 1,
                     ["--scan_layers", "true", "--pp_microbatches", "2"])
    return rc


if __name__ == "__main__":
    sys.exit(launch())
