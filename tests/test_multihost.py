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
        monkeypatch.setattr(distributed, "host_shard",
                            lambda args=None: (pid, 2))
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


def test_data_group_mesh_aware():
    """host_shard must be MESH-aware: processes whose devices cover the same
    data-axis coordinates (only pipe/fsdp/model axes cross the process
    boundary) are one data group and must feed IDENTICAL streams; processes
    covering disjoint data coordinates must feed DISJOINT streams. Regression
    for the round-3 advisor finding: (process_index, process_count) fed the
    two pipe stages of a dp=4 x pipe=2 mesh DIFFERENT data, silently pairing
    stage-0 activations with stage-1's different batch."""
    import numpy as np

    from vit_tpu.train.distributed import _data_group

    class Dev:
        def __init__(self, pidx):
            self.process_index = pidx

    def mesh_arr(pp, dp, fsdp, tp, pcount):
        n = pp * dp * fsdp * tp
        per = n // pcount
        return np.asarray([Dev(i // per) for i in range(n)],
                          dtype=object).reshape(pp, dp, fsdp, tp)

    names = ("pipe", "data", "fsdp", "model")

    # dp=4 x pp=2 over 2 procs: pipe axis crosses the boundary -> ONE group
    arr = mesh_arr(2, 4, 1, 1, 2)
    assert _data_group(arr, names, 0, 2) == (0, 1)
    assert _data_group(arr, names, 1, 2) == (0, 1)

    # dp=2 x fsdp=2 x tp=2 over 2 procs: data splits -> two disjoint groups
    arr = mesh_arr(1, 2, 2, 2, 2)
    assert _data_group(arr, names, 0, 2) == (0, 2)
    assert _data_group(arr, names, 1, 2) == (1, 2)

    # dp=4 x pp=2 over 4 procs: procs {0,2} and {1,3} pair up across pipe
    arr = mesh_arr(2, 4, 1, 1, 4)
    assert _data_group(arr, names, 0, 4) == (0, 2)
    assert _data_group(arr, names, 1, 4) == (1, 2)
    assert _data_group(arr, names, 2, 4) == (0, 2)
    assert _data_group(arr, names, 3, 4) == (1, 2)

    # pure dp over 8 procs: per-process split (the old behavior, still right)
    arr = mesh_arr(1, 8, 1, 1, 8)
    for p in range(8):
        assert _data_group(arr, names, p, 8) == (p, 8)

    # a process with no devices on the mesh mirrors MeshRunner's
    # full-axis fallback
    assert _data_group(mesh_arr(1, 4, 1, 1, 4), names, 7, 8) == (0, 1)
