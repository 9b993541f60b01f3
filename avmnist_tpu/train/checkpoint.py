"""Orbax checkpointing of the full TrainState (+ PRNG key + step), the TPU analog of
the reference's three checkpoint mechanisms (SURVEY.md §5 checkpoint/resume):
best-metric top-k policy + explicit save, with the reference's
``<model>_<metric>_<timestamp>`` run-dir layout handled by the experiment driver."""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from avmnist_tpu.train.state import TrainState


def save_checkpoint(path: str, state: TrainState, extra: Optional[dict] = None) -> str:
    """Save state (and optional host metadata) to ``path`` (a directory)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"state": jax.device_get(state)}
    if extra:
        payload["extra"] = extra
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, template_state: TrainState,
                    extra_template: Optional[dict] = None) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {"state": jax.device_get(template_state)}
    if extra_template is not None:
        template["extra"] = extra_template
    restored = ckptr.restore(path, template)
    return (restored["state"], restored.get("extra")) if extra_template is not None \
        else restored["state"]


class BestCheckpointer:
    """save_top_k=1 on a monitored metric (ModelCheckpoint analog, run_dino.py:330-333)."""

    def __init__(self, directory: str, monitor: str = "mlp_acc", mode: str = "max"):
        self.directory = directory
        self.monitor = monitor
        self.mode = mode
        self.best: Optional[float] = None
        self.best_path: Optional[str] = None

    def update(self, metrics: dict, state: TrainState, extra: Optional[dict] = None) -> bool:
        value = float(metrics[self.monitor])
        better = (
            self.best is None
            or (value > self.best if self.mode == "max" else value < self.best)
        )
        if better:
            self.best = value
            self.best_path = save_checkpoint(
                os.path.join(self.directory, "best"), state, extra)
        return better
