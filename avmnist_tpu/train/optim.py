"""Optimizers/schedules matching torch semantics.

- ``torch_adam(lr, weight_decay)``: torch ``optim.Adam(weight_decay=wd)`` couples the
  decay into the gradient BEFORE the moment updates (L2, not AdamW) — expressed as
  ``optax.chain(add_decayed_weights, scale_by_adam, lr)``.
- ``torch_adamw``: torch ``optim.AdamW`` == optax.adamw.
- ``cosine_epoch_schedule``: torch ``CosineAnnealingLR(T_max=num_epochs)`` stepped once
  per EPOCH (reference steps the scheduler per epoch, dino.py:953-962) — quantized to
  epoch boundaries to match the reference trajectory exactly.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def cosine_epoch_schedule(lr: float, num_epochs: int, steps_per_epoch: int,
                          warmup_epochs: int = 0):
    """Reference-exact when ``warmup_epochs=0`` (the default everywhere).

    ``warmup_epochs>0`` prepends a linear per-STEP ramp 0->lr over that many
    epochs before the epoch-quantized cosine — the canonical DINO collapse
    protection (not in the reference; documented in docs/DEVIATIONS.md, used
    only by the opt-in ``lr_warmup_epochs`` hyperparameter)."""
    warm_steps = warmup_epochs * steps_per_epoch

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, num_epochs)
        cos = lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / num_epochs))
        if not warm_steps:
            return cos
        ramp = lr * (step + 1) / warm_steps
        return jnp.where(step < warm_steps, ramp, cos)

    return schedule


def torch_adam(learning_rate, weight_decay: float = 0.0) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def torch_adamw(learning_rate, weight_decay: float = 0.01) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=weight_decay)
