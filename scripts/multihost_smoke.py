"""Multi-host (multi-process) training smoke: jax.distributed + global dp mesh.

Launches N worker processes on localhost (each a separate JAX process with its
own 4-device virtual CPU platform), brings them up with
``vit_tpu.parallel.mesh.init_distributed``, builds ONE global mesh spanning all
processes' devices, gives each process a disjoint data shard
(``shard_id=process_index`` — the loader sharding the reference lacks), and
runs a jitted global-batch TiTok train step. Every process must report the
same finite loss (grads psum across hosts via GSPMD).

This is the bring-up recipe for a real Cloud TPU pod: replace the explicit
coordinator flags with a bare ``init_distributed()`` (auto-detected) and the
virtual CPU platform with the real chips; the mesh/step code is unchanged.

    python scripts/multihost_smoke.py            # launcher (spawns 2 workers)
    python scripts/multihost_smoke.py --worker 0 # (internal) one worker
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
N_PROC = 2
DEVICES_PER_PROC = 4
PORT = 9723


def worker(process_id: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, str(REPO))
    from vit_tpu.parallel.mesh import init_distributed

    init_distributed(coordinator_address=f"127.0.0.1:{PORT}",
                     num_processes=N_PROC, process_id=process_id)
    assert jax.device_count() == N_PROC * DEVICES_PER_PROC, jax.device_count()
    assert jax.process_count() == N_PROC

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vit_tpu.models.titok import TiTok, TiTokConfig
    from vit_tpu.parallel.mesh import make_mesh
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState
    from vit_tpu.train.step import make_tokenizer_train_step

    mesh = make_mesh(dp=N_PROC * DEVICES_PER_PROC)
    config = TiTokConfig(image_size=32, patch_size=8, latent_tokens=8,
                         codebook_size=64, latent_dim=12, transformer="S",
                         dtype=jnp.float32)
    for name in ("enc_vit_config", "dec_vit_config"):
        sub = getattr(config, name)
        sub.trans_config = sub.trans_config.replace(n_layers=1, n_heads=2,
                                                    n_embd=64)
    config.n_embd = 64
    model = TiTok(config)

    # Per-host disjoint data shard (what DataLoader(shard_id=process_index,
    # num_shards=process_count) produces); identical content across seeds so
    # the loss is deterministic per host-count.
    per_host = 2 * DEVICES_PER_PROC
    rng = np.random.default_rng(1234 + process_id)  # disjoint shards
    local_images = rng.uniform(0, 1, (per_host, 32, 32, 3)).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    tx = make_optimizer(1e-4, 10, 100, 1e-5, 1e-4, clip_norm=1.0)
    state = TrainState.create(params, tx)

    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    state = jax.device_put(state, rep)
    usage = jax.device_put(jnp.zeros((config.codebook_size,), jnp.float32), rep)
    step_rng = jax.device_put(jax.random.PRNGKey(7), rep)
    # Global array from per-host shards: the canonical multi-host input path.
    global_images = jax.make_array_from_process_local_data(
        bsh, local_images, (N_PROC * per_host, 32, 32, 3))

    step_fn = jax.jit(make_tokenizer_train_step(model),
                      in_shardings=(rep, bsh, rep, rep),
                      out_shardings=(rep, rep, rep, bsh),
                      donate_argnums=(0,))
    with mesh:
        state, usage, metrics, _ = step_fn(state, global_images, usage,
                                           step_rng)
        jax.block_until_ready(state.params)
    loss = float(np.asarray(metrics["train/loss"]))
    assert np.isfinite(loss), loss
    print(f"worker {process_id}: OK global_bs={N_PROC * per_host} "
          f"devices={jax.device_count()} loss={loss:.4f}", flush=True)


def launch() -> int:
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ)
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append(
            f"--xla_force_host_platform_device_count={DEVICES_PER_PROC}")
        env["XLA_FLAGS"] = " ".join(flags)
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--worker", str(pid)],
            env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    rc = 0
    for pid, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=600)
        tail = "\n".join(out.strip().splitlines()[-3:])
        print(f"--- worker {pid} (rc={proc.returncode}) ---\n{tail}")
        rc |= proc.returncode
    if rc == 0:
        print("multihost smoke OK")
    return rc


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--worker", type=int, default=None)
    args = parser.parse_args()
    if args.worker is None:
        sys.exit(launch())
    worker(args.worker)
