"""Functional train state: the entire mutable world of a training run as one pytree.

Replaces the reference's implicit Lightning module state (params + BN running stats +
optimizer + EMA teacher + center buffer scattered across nn.Modules). Everything is
explicit here so steps are pure ``(state, batch, rng) -> (state, metrics)`` functions,
checkpointable with orbax in one call, and trivially replicable over a mesh.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # Objective-specific slots (None when unused):
    teacher_params: Any = None        # DINO EMA teacher (dino.py:615-629)
    teacher_batch_stats: Any = None
    center: Any = None                # DINO center buffer (dino.py:632)

    def param_count(self) -> int:
        return sum(x.size for x in jax.tree.leaves(self.params))
