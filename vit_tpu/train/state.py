"""Train state: params + optimizer state + step, as a pytree.

Replaces the reference's (model, optim, lr_sched, GradScaler) quartet
(e.g. train_vit.py:80-84). No GradScaler: TPU bf16 has fp32 range, loss scaling is
unnecessary (the reference's AMP machinery is a CUDA fp16-ism).
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        import jax.numpy as jnp

        if isinstance(params, FrozenDict):
            params = params.unfreeze()
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)


def param_count(params) -> int:
    """Total parameter count (reference utils.py:3)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def params_str(params) -> str:
    return f"{param_count(params) / 1e6:.1f}M"
