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
    # Optional Polyak/EMA weight average (--ema_decay): tokenizer-family
    # training commonly evals/serves the EMA weights. None (the default)
    # keeps the pytree identical to pre-EMA checkpoints. The decay is a
    # static field so the EMA update fuses into the jitted train step —
    # one extra multiply-add stream over the params, no extra pass.
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            new_ema = jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1 - d),
                                   self.ema_params, new_params)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, ema_params=new_ema)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, *,
               ema_decay: float = 0.0) -> "TrainState":
        import jax.numpy as jnp

        if isinstance(params, FrozenDict):
            params = params.unfreeze()
        # a REAL copy, not an alias: params and ema are both donated by the
        # jitted train step, and XLA rejects donating the same buffer twice
        ema = (jax.tree.map(jnp.array, params) if ema_decay > 0 else None)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx, ema_params=ema,
                   ema_decay=float(ema_decay))


def param_count(params) -> int:
    """Total parameter count (reference utils.py:3)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def params_str(params) -> str:
    return f"{param_count(params) / 1e6:.1f}M"
