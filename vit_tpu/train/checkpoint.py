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
        self._pending_swaps: list = []   # [(tmp_path, final_path), ...]

    def _apply_pending_swaps(self):
        """Promote finished async writes from their tmp dirs to their tags.
        Caller must hold wait_until_finished (writes durable). The old tag stays
        on disk until the new one is in place, so a crash at any point leaves a
        restorable checkpoint: before the swap the old tag survives (a stale
        ``.{tag}.tmp`` is cleaned up on the next save), after it the new one."""
        import shutil

        for tmp, final in self._pending_swaps:
            if not tmp.exists():
                continue
            old = final.with_name(final.name + ".old")
            if old.exists():
                shutil.rmtree(old)
            if final.exists():
                final.rename(old)
            tmp.rename(final)
            if old.exists():
                shutil.rmtree(old)
        self._pending_swaps.clear()

    def _improved(self, metric: float) -> bool:
        if self.best is None:
            return True
        return metric < self.best if self.mode == "min" else metric > self.best

    def save_if_best(self, state: TrainState, metric: float, config=None,
                     extra=None) -> bool:
        if not self._improved(metric):
            return False
        self.best = float(metric)
        self.save(state, config=config, tag="best", extra=extra)
        return True

    def save(self, state: TrainState, *, config=None, tag: str = "last",
             extra=None):
        """Kick off an ASYNC save: the device→host copy happens before this
        returns (donation-safe — the training step may overwrite the buffers),
        but the disk write runs in a background thread (orbax AsyncCheckpointer).
        Call ``finalize()`` before reading the checkpoint back or exiting.

        Crash-safe: the write lands in a ``.{tag}.tmp`` dir and is promoted to
        ``tag`` only after it is durable (at the next save/finalize/restore
        barrier), so the previous checkpoint survives a crash at any point."""
        path = self.directory / f".{tag}.tmp"
        tree = {"step": state.step, "params": state.params,
                "opt_state": state.opt_state}
        if extra:
            # auxiliary mutable collections that live outside TrainState —
            # e.g. the Bytedance clustering-EMA accumulators (train_tatitok's
            # vq_stats): without them a --resume run silently reseeds the EMA
            tree["extra"] = extra
        if state.ema_params is not None:
            # only when EMA is on: checkpoints without it keep the exact
            # pre-EMA tree (old checkpoints stay restorable either way)
            tree["ema_params"] = state.ema_params
        multihost = jax.process_count() > 1
        proc0 = jax.process_index() == 0
        self._ckptr.wait_until_finished()  # serialize with the previous save
        if proc0 or not multihost:
            self._apply_pending_swaps()    # promote the previous durable write
            if path.exists():              # stale tmp from a crashed run
                import shutil

                shutil.rmtree(path)
        if multihost:
            # all processes must enter orbax's collective save together, after
            # proc 0 cleared the stale tmp directory
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_clear_{tag}")
        self._ckptr.save(path, tree)
        if proc0 or not multihost:
            self._pending_swaps.append((path, self.directory / tag))
        if proc0 or not multihost:
            if config is not None:
                (self.directory / f"{tag}_config.json").write_text(
                    json.dumps(_config_to_dict(config), indent=2))
            meta = {"best": self.best, "step": int(jax.device_get(state.step))}
            (self.directory / f"{tag}_meta.json").write_text(json.dumps(meta))

    def finalize(self):
        """Block until any in-flight async save is durable on disk and promoted."""
        self._ckptr.wait_until_finished()
        if jax.process_count() == 1 or jax.process_index() == 0:
            self._apply_pending_swaps()

    def restore(self, state_template: TrainState, tag: str = "last",
                extra_template=None):
        """Restore the train state (and, when ``extra_template`` is given, the
        auxiliary ``extra`` tree saved alongside it — returning
        ``(state, extra_or_None)`` instead of just the state).

        Checkpoints written before an optional subtree existed (pre-EMA,
        pre-extra) stay restorable: the missing subtree is dropped from the
        template and re-seeded by the caller's semantics."""
        self._ckptr.wait_until_finished()
        self._apply_pending_swaps()
        path = self.directory / tag
        tree = {"step": state_template.step, "params": state_template.params,
                "opt_state": state_template.opt_state}
        want_ema = state_template.ema_params is not None
        if want_ema:
            tree["ema_params"] = state_template.ema_params
        if extra_template is not None:
            tree["extra"] = extra_template
        # Reconcile optional subtrees against what the checkpoint actually
        # holds (read off orbax metadata — StandardCheckpointer requires the
        # template tree to match the saved tree exactly, both ways):
        #  - template asks for a subtree the checkpoint lacks (resuming an
        #    --ema_decay / clustering run from an older checkpoint): drop it,
        #    the caller re-seeds;
        #  - checkpoint holds a subtree the template didn't ask for: restore
        #    it through an abstract metadata-shaped template and discard.
        try:
            md_tree = self._ckptr.metadata(path).item_metadata.tree
        except Exception:
            md_tree = None
        if md_tree is not None:
            for k in ("extra", "ema_params"):
                if k in tree and k not in md_tree:
                    del tree[k]
                elif k not in tree and k in md_tree:
                    tree[k] = jax.tree.map(
                        lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype),
                        md_tree[k])
        restored = self._ckptr.restore(path, tree)
        if want_ema and "ema_params" not in restored:
            import jax.numpy as jnp

            # real copies: ema and params may both be donated by the step
            restored["ema_params"] = jax.tree.map(jnp.array,
                                                  restored["params"])
        meta_path = self.directory / f"{tag}_meta.json"
        if meta_path.exists():
            self.best = json.loads(meta_path.read_text()).get("best")
        state = state_template.replace(
            step=restored["step"], params=restored["params"],
            opt_state=restored["opt_state"],
            ema_params=restored["ema_params"] if want_ema else None)
        if extra_template is not None:
            return state, restored.get("extra")
        return state

    def can_restore(self, tag: str = "last") -> bool:
        return (self.directory / tag).exists()

    # -- input-stream position (vit_tpu/data/resume.py) --------------------
    # A small JSON history keyed by optimizer step, written next to every
    # checkpoint, so --resume can fast-forward the data pipeline to the batch
    # after the one the restored step consumed. History (rather than a single
    # entry) because the state save is async: if a crash lands between the
    # JSON write and the orbax promote, "last" still points at the previous
    # step — whose entry is retained.

    def save_data_state(self, step: int, data_state: Dict[str, Any], *,
                        keep: int = 8):
        if jax.process_count() > 1 and jax.process_index() != 0:
            return
        path = self.directory / "data_state.json"
        hist: Dict[str, Any] = {}
        if path.exists():
            try:
                hist = json.loads(path.read_text())
            except (json.JSONDecodeError, OSError):
                hist = {}
        hist[str(int(step))] = data_state
        for k in sorted(hist, key=int)[:-keep]:
            del hist[k]
        tmp = path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(hist))
        tmp.replace(path)

    def load_data_state(self, step: int) -> Optional[Dict[str, Any]]:
        """Entry for ``step``, or the newest entry at an earlier step (the
        async-save crash window above), or None (pre-feature checkpoints)."""
        path = self.directory / "data_state.json"
        if not path.exists():
            return None
        try:
            hist = json.loads(path.read_text())
        except (json.JSONDecodeError, OSError):
            return None
        eligible = [int(k) for k in hist if int(k) <= int(step)]
        if not eligible:
            return None
        return hist[str(max(eligible))]


def load_params(directory: str, tag: Optional[str] = None, *,
                ema: bool = False):
    """Restore just the ``params`` tree from a checkpoint dir, no state template
    needed (orbax reconstructs the structure from its saved metadata). Used by
    cross-script hand-offs — e.g. ``train_vit.py --init_from <mae_ckpt>`` loading a
    pretrained MAE encoder for fine-tuning. ``tag=None`` prefers ``best`` over
    ``last``. ``ema=True`` returns the EMA weight average instead (requires a
    checkpoint written by an ``--ema_decay`` run)."""
    d = Path(directory).absolute()
    if tag is None:
        tag = "best" if (d / "best").exists() else "last"
    if not (d / tag).exists():
        raise FileNotFoundError(f"no '{tag}' checkpoint under {d}")
    restored = ocp.StandardCheckpointer().restore(d / tag)
    if ema:
        if "ema_params" not in restored:
            raise ValueError(
                f"checkpoint {d / tag} holds no EMA average (train with "
                "--ema_decay to write one)")
        return restored["ema_params"]
    return restored["params"]


def has_ema(directory: str, tag: str = "best") -> bool:
    """Whether a checkpoint was written by an ``--ema_decay`` run (holds an
    ``ema_params`` subtree), read off orbax metadata without a restore."""
    d = Path(directory).absolute()
    md = ocp.StandardCheckpointer().metadata(d / tag)
    tree = md.item_metadata.tree  # StepMetadata → {'params': ..., ...}
    return "ema_params" in tree
