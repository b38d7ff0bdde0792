"""Checkpointable input streams (vit_tpu/data/resume.py): a --resume run
continues the exact batch sequence an uninterrupted run would consume.

The reference restarts its DataLoader from scratch on any restart (it has no
resume path at all, SURVEY.md §5); here the loops persist {"epoch",
"next_batch"} next to every orbax checkpoint and fast-forward on --resume."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

from vit_tpu.data.loader import DataLoader
from vit_tpu.data.resume import resume_stream, set_stream_epoch
from vit_tpu.data.synthetic import SyntheticImageLoader

ROOT = Path(__file__).resolve().parent.parent


class _ArangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2,), i, np.int64)


def _epoch_batches(loader):
    return [np.asarray(b) for b in loader]


def test_dataloader_skip_matches_suffix():
    """The index-slice fast path yields exactly the suffix of the shuffled
    epoch — and never submits the skipped samples for decode."""
    a = DataLoader(_ArangeDataset(23), 4, shuffle=True, seed=3, num_workers=2)
    full = _epoch_batches(a)  # epoch 0

    b = DataLoader(_ArangeDataset(23), 4, shuffle=True, seed=3, num_workers=2)
    skipped = _epoch_batches(resume_stream(b, 2))  # epoch 0, skip 2 batches
    assert len(skipped) == len(full) - 2
    for got, want in zip(skipped, full[2:]):
        np.testing.assert_array_equal(got, want)
    # the one-shot skip must not leak into the next epoch
    assert b._skip_next == 0
    assert len(_epoch_batches(b)) == len(full)


def test_dataloader_skip_past_end_yields_empty_epoch():
    dl = DataLoader(_ArangeDataset(8), 4, shuffle=False)
    assert _epoch_batches(resume_stream(dl, 99)) == []


def test_generic_skip_on_iterables():
    """Loaders without a native fast path fall back to consume-and-discard."""
    a = SyntheticImageLoader(8, 2, steps_per_epoch=5, seed=1)
    full = [img for img, _ in a]  # epoch 0
    b = SyntheticImageLoader(8, 2, steps_per_epoch=5, seed=1)
    got = [img for img, _ in resume_stream(b, 3)]
    assert len(got) == 2
    np.testing.assert_array_equal(got[0], full[3])
    np.testing.assert_array_equal(got[1], full[4])


def test_set_stream_epoch_walks_nested_datasets():
    """set_stream_epoch reaches `_epoch` through .dataset chains (e.g.
    StreamingBatcher -> StreamingWebDataset, _CodeStream -> DataLoader)."""

    class Outer:
        def __init__(self, dataset):
            self.dataset = dataset

    inner = SyntheticImageLoader(8, 2, steps_per_epoch=3, seed=7)
    for _ in inner:  # advance to epoch 1
        pass
    assert inner._epoch == 1
    assert set_stream_epoch(Outer(inner), 0)
    first_again = next(iter(inner))[0]

    fresh = SyntheticImageLoader(8, 2, steps_per_epoch=3, seed=7)
    np.testing.assert_array_equal(first_again, next(iter(fresh))[0])

    assert not set_stream_epoch(object(), 0)  # nothing to set -> False


def test_checkpointer_data_state_history(tmp_path):
    from vit_tpu.train.checkpoint import Checkpointer

    ckpt = Checkpointer(str(tmp_path))
    assert ckpt.load_data_state(100) is None  # pre-feature checkpoint dirs
    for step in range(1, 12):
        ckpt.save_data_state(step, {"epoch": 0, "next_batch": step}, keep=8)
    hist = json.loads((tmp_path / "data_state.json").read_text())
    assert len(hist) == 8 and "1" not in hist  # oldest trimmed
    assert ckpt.load_data_state(11) == {"epoch": 0, "next_batch": 11}
    # async-save crash window: no exact entry -> newest entry at <= step
    ckpt2 = Checkpointer(str(tmp_path))
    assert ckpt2.load_data_state(10**9) == {"epoch": 0, "next_batch": 11}
    assert ckpt2.load_data_state(2) is None or \
        ckpt2.load_data_state(2)["next_batch"] <= 2


def _run_titok(cwd, ckpt_dir, epochs, extra=()):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1",
               VIT_TPU_RUN_DIR=str(Path(cwd) / "runs"))
    env.pop("XLA_FLAGS", None)  # single device: tiny batch, no dp mesh
    cmd = [sys.executable, str(ROOT / "train_titok.py"),
           "--dataset", "synthetic", "--transformer", "S", "--n_layers", "2",
           "--image_size", "16", "--patch_size", "8", "--latent_tokens", "4",
           "--codebook_size", "32", "--bs", "4", "--epochs", str(epochs),
           "--steps_per_epoch", "3", "--log_every", "1", "--warmup_steps", "2",
           "--train_steps", "100", "--image_every", "1000", "--no_wandb",
           "--mixed", "false", "--ckpt_dir", str(ckpt_dir), *extra]
    proc = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    jsonl = Path(cwd) / "runs" / "titok-synthetic" / "8px_16px_S_4_32.jsonl"
    rows = [json.loads(line) for line in jsonl.read_text().splitlines()]
    return {r["_step"]: r for r in rows if "train/loss" in r}, proc.stdout


def test_e2e_resume_matches_uninterrupted_run(tmp_path):
    """train_titok for 2 epochs straight vs 1 epoch + --resume for the second:
    the resumed run must consume the SAME batches and land the SAME losses
    (the loop restores both the model state and the stream position)."""
    a_dir = tmp_path / "a"
    b_dir = tmp_path / "b"
    a_dir.mkdir()
    b_dir.mkdir()

    straight, _ = _run_titok(a_dir, a_dir / "ckpt", epochs=2)

    _run_titok(b_dir, b_dir / "ckpt", epochs=1)
    resumed, out2 = _run_titok(b_dir, b_dir / "ckpt", epochs=2,
                               extra=("--resume",))
    assert "RESUMED data stream at epoch 1, batch 0" in out2, out2

    # epoch-1 steps (4..6) must match the uninterrupted run's exactly
    second_epoch = [s for s in straight if s > 3]
    assert second_epoch, f"unexpected step keys: {sorted(straight)}"
    for s in second_epoch:
        np.testing.assert_allclose(resumed[s]["train/loss"],
                                   straight[s]["train/loss"], rtol=1e-6)
        np.testing.assert_allclose(resumed[s]["train/recon_loss"],
                                   straight[s]["train/recon_loss"], rtol=1e-6)
