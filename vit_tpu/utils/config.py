"""Config (de)serialization helpers.

Checkpoints store the model config as JSON including derived __post_init__ fields
(mirroring the reference's ``torch.save({"config": <dataclass>, ...})``,
train_titok.py:172). Reconstruction filters back to init fields and re-derives.
"""

from __future__ import annotations

import dataclasses
from typing import Type, TypeVar

import jax.numpy as jnp

T = TypeVar("T")

_DTYPE_NAMES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}


def _coerce(field: dataclasses.Field, value):
    if value is None:
        return None
    if field.type in ("jnp.dtype",) or "dtype" in field.name:
        if isinstance(value, str):
            for name, dt in _DTYPE_NAMES.items():
                if name in value:
                    return dt
    if isinstance(value, list):
        return tuple(value)
    return value


def dataclass_from_dict(cls: Type[T], data: dict) -> T:
    """Build a (possibly non-frozen) config dataclass from a dict produced by
    vit_tpu.train.checkpoint._config_to_dict, ignoring derived fields."""
    init_fields = {f.name: f for f in dataclasses.fields(cls) if f.init}
    kwargs = {name: _coerce(f, data[name])
              for name, f in init_fields.items() if name in data}
    return cls(**kwargs)


def str2bool(value) -> bool:
    """argparse bool parser: the reference used ``type=bool`` (train_vit.py:65),
    under which ``--mixed False`` parses as True (any non-empty string is truthy).
    Flag-name parity doesn't require parity in broken parsing — accept the usual
    spellings and reject everything else."""
    if isinstance(value, bool):
        return value
    v = str(value).strip().lower()
    if v in ("true", "t", "yes", "y", "1"):
        return True
    if v in ("false", "f", "no", "n", "0"):
        return False
    import argparse

    raise argparse.ArgumentTypeError(f"expected a boolean, got {value!r}")
