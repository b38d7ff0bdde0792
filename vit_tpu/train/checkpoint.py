"""Orbax checkpointing with best-metric gating and full resume.

Semantic parity with the reference's ``torch.save({"config": ..., "state_dict": ...})``
best-metric checkpoints (train_titok.py:170-172, train_vit.py:127-129) — same contents
(config + weights) — plus what the reference lacks entirely (SURVEY.md §5): optimizer
state, step counter, and a resume path (the reference writes checkpoints it never
reads back).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from vit_tpu.train.state import TrainState


def _config_to_dict(config) -> Dict[str, Any]:
    if dataclasses.is_dataclass(config):
        out = {}
        for f in dataclasses.fields(config):
            v = getattr(config, f.name)
            out[f.name] = _config_to_dict(v) if dataclasses.is_dataclass(v) else _jsonable(v)
        # include derived attrs set in __post_init__ (reference configs mutate them)
        for k, v in vars(config).items():
            if k not in out:
                out[k] = _config_to_dict(v) if dataclasses.is_dataclass(v) else _jsonable(v)
        return out
    return _jsonable(config)


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


class Checkpointer:
    """Best-metric-gated checkpoint writer + resume reader."""

    def __init__(self, directory: str, *, mode: str = "min"):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.mode = mode
        self.best: Optional[float] = None
        self._ckptr = ocp.StandardCheckpointer()

    def _improved(self, metric: float) -> bool:
        if self.best is None:
            return True
        return metric < self.best if self.mode == "min" else metric > self.best

    def save_if_best(self, state: TrainState, metric: float, config=None) -> bool:
        if not self._improved(metric):
            return False
        self.best = float(metric)
        self.save(state, config=config, tag="best")
        return True

    def save(self, state: TrainState, *, config=None, tag: str = "last"):
        """Kick off an ASYNC save: the device→host copy happens before this
        returns (donation-safe — the training step may overwrite the buffers),
        but the disk write runs in a background thread (orbax AsyncCheckpointer).
        Call ``finalize()`` before reading the checkpoint back or exiting.
        Crash window (pre-existing): the previous ``tag`` dir is removed before
        the new write is durable; a crash in between loses that tag."""
        path = self.directory / tag
        tree = {"step": state.step, "params": state.params,
                "opt_state": state.opt_state}
        multihost = jax.process_count() > 1
        proc0 = jax.process_index() == 0
        self._ckptr.wait_until_finished()  # serialize with the previous save
        if path.exists() and (proc0 or not multihost):
            import shutil

            shutil.rmtree(path)
        if multihost:
            # all processes must enter orbax's collective save together, after
            # proc 0 cleared the stale directory
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_clear_{tag}")
        self._ckptr.save(path, tree)
        if proc0 or not multihost:
            if config is not None:
                (self.directory / f"{tag}_config.json").write_text(
                    json.dumps(_config_to_dict(config), indent=2))
            meta = {"best": self.best, "step": int(jax.device_get(state.step))}
            (self.directory / f"{tag}_meta.json").write_text(json.dumps(meta))

    def finalize(self):
        """Block until any in-flight async save is durable on disk."""
        self._ckptr.wait_until_finished()

    def restore(self, state_template: TrainState, tag: str = "last") -> TrainState:
        self._ckptr.wait_until_finished()
        path = self.directory / tag
        tree = {"step": state_template.step, "params": state_template.params,
                "opt_state": state_template.opt_state}
        restored = self._ckptr.restore(path, tree)
        meta_path = self.directory / f"{tag}_meta.json"
        if meta_path.exists():
            self.best = json.loads(meta_path.read_text()).get("best")
        return state_template.replace(step=restored["step"],
                                      params=restored["params"],
                                      opt_state=restored["opt_state"])

    def can_restore(self, tag: str = "last") -> bool:
        return (self.directory / tag).exists()


def load_params(directory: str, tag: Optional[str] = None):
    """Restore just the ``params`` tree from a checkpoint dir, no state template
    needed (orbax reconstructs the structure from its saved metadata). Used by
    cross-script hand-offs — e.g. ``train_vit.py --init_from <mae_ckpt>`` loading a
    pretrained MAE encoder for fine-tuning. ``tag=None`` prefers ``best`` over
    ``last``."""
    d = Path(directory).absolute()
    if tag is None:
        tag = "best" if (d / "best").exists() else "last"
    if not (d / tag).exists():
        raise FileNotFoundError(f"no '{tag}' checkpoint under {d}")
    restored = ocp.StandardCheckpointer().restore(d / tag)
    return restored["params"]
