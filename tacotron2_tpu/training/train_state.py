"""Train state pytree: params + BN running stats + optimizer state + step."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    model_state: Any  # BatchNorm running stats
    opt_state: Any
    step: jnp.ndarray  # () int32

    @staticmethod
    def create(params, model_state, tx) -> "TrainState":
        return TrainState(
            params=params,
            model_state=model_state,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )
