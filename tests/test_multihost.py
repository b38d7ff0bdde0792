"""Multi-process jax.distributed smoke THROUGH THE ENTRY POINT: 2 workers x 4
virtual CPU devices each, per-process batch shards, proc-0 logging, collective
orbax checkpoint. Two arms: one global dp=2 x fsdp=2 x tp=2 mesh, and a
dp=4 x pipe=2 mesh whose pipeline-stage axis splits ACROSS the two processes
(every stage handoff collective-permute crosses the process boundary).
(scripts/multihost_smoke.py — the bring-up recipe for a real TPU pod.)"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_multihost_smoke():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "multihost_smoke.py")],
        capture_output=True, text=True, timeout=1800, cwd=str(REPO))
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert proc.stdout.count("multihost smoke OK") == 2
    assert "mesh 2,2,2" in proc.stdout
    assert "mesh 4,1,1,2" in proc.stdout
    assert proc.stdout.count("collective_ckpt=yes") == 2
