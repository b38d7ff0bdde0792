"""Multi-process jax.distributed smoke: 2 workers x 4 virtual CPU devices, one
global dp mesh, per-host data shards, identical loss on every process.
(scripts/multihost_smoke.py — the bring-up recipe for a real TPU pod.)"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_multihost_smoke():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "multihost_smoke.py")],
        capture_output=True, text=True, timeout=600, cwd=str(REPO))
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "multihost smoke OK" in proc.stdout
    # both workers computed the same global loss
    losses = {line.split("loss=")[1] for line in proc.stdout.splitlines()
              if "loss=" in line}
    assert len(losses) == 1, proc.stdout
