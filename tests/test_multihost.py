"""Multi-process jax.distributed smoke THROUGH THE ENTRY POINT: 2 workers x 4
virtual CPU devices each, one global dp=2 x fsdp=2 x tp=2 mesh, per-process batch
shards, proc-0 logging, collective orbax checkpoint.
(scripts/multihost_smoke.py — the bring-up recipe for a real TPU pod.)"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_multihost_smoke():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "multihost_smoke.py")],
        capture_output=True, text=True, timeout=900, cwd=str(REPO))
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "multihost smoke OK" in proc.stdout
    assert "mesh 2,2,2" in proc.stdout
    assert "collective_ckpt=yes" in proc.stdout
