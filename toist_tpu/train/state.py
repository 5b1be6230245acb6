"""Train state pytree.

The reference's mutable training state ({model, model_ema, optimizer, epoch, cluster
bank}, main.py:641-652) becomes one immutable pytree threaded through the jitted step.
Teacher params and the cluster memory bank join in the distillation phase.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Optional[Any]
    step: jnp.ndarray
    # Distillation extras (None for plain training):
    teacher_params: Optional[Any] = None
    teacher_ema_params: Optional[Any] = None
    cluster_bank: Optional[Any] = None
