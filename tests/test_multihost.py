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


def test_host_shard_slices_loaders(monkeypatch):
    """Each host's loader must feed DISTINCT data (multihost DP correctness:
    identical streams would train on process_count copies of every sample).
    host_shard() is faked per 'host'; the real get_loader plumbing does the rest."""
    import argparse

    import numpy as np

    import train_titok
    from vit_tpu.train import distributed

    def loader_for(pid):
        monkeypatch.setattr(distributed, "host_shard", lambda: (pid, 2))
        args = argparse.Namespace(dataset="synthetic", image_size=16, bs=4,
                                  steps_per_epoch=2, seed=0)
        return train_titok.get_loader(args)

    b0 = next(iter(loader_for(0)))[0]
    b1 = next(iter(loader_for(1)))[0]
    assert b0.shape == b1.shape
    assert not np.allclose(np.asarray(b0), np.asarray(b1))

    # map-style DataLoader: shared seed + strided slice -> disjoint indices
    from vit_tpu.data.loader import DataLoader

    class Ints:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return np.asarray([i])

    got = [np.concatenate([np.asarray(b).reshape(-1) for b in
                           DataLoader(Ints(), 4, shuffle=True, num_workers=1,
                                      shard_id=pid, num_shards=2)])
           for pid in (0, 1)]
    seen0, seen1 = set(got[0].reshape(-1)), set(got[1].reshape(-1))
    assert not (seen0 & seen1) and len(seen0 | seen1) == 32
