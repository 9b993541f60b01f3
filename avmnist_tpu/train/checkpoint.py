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


def save_last(directory: str, state: TrainState, epoch: int, rng,
              best: Optional[float] = None) -> str:
    """Rolling mid-run checkpoint (overwrites ``<directory>/last``).

    Beyond the reference (SURVEY.md §5: 'no mid-epoch resume anywhere' — its
    recovery story is reload-best-and-continue-downstream): stores the epoch
    counter, the threaded PRNG key, and the best-metric watermark, so a killed
    run resumes EXACTLY on the resident input path (epoch plans are pure
    functions of (seed, epoch), data/resident.py). Motivated by observed
    multi-hour TPU-relay RPC stalls that kill long protocol runs."""
    extra = {
        "epoch": np.asarray(epoch, np.int64),
        "rng": np.asarray(jax.random.key_data(rng)),
        "best": np.asarray(np.nan if best is None else best, np.float64),
    }
    return save_checkpoint(os.path.join(directory, "last"), state, extra)


def is_finalized(path: str) -> bool:
    """True iff ``path`` holds a COMPLETE orbax checkpoint. A SIGKILL landing
    mid-save (the stall watchdog's 5 s grace window) can leave a directory
    without orbax's finalize marker; restoring from it crashes, so loaders must
    treat it as absent."""
    return os.path.isdir(path) and os.path.exists(
        os.path.join(path, "_CHECKPOINT_METADATA"))


def load_last(directory: str, template_state: TrainState):
    """Restore a ``save_last`` checkpoint; returns (state, epoch, rng, best)
    or None when no FINALIZED ``last`` checkpoint exists (half-written ones —
    see ``is_finalized`` — are skipped, not crashed on)."""
    path = os.path.join(directory, "last")
    if not is_finalized(path):
        return None
    key_shape = np.asarray(jax.random.key_data(jax.random.key(0)))
    extra_template = {
        "epoch": np.asarray(0, np.int64),
        "rng": np.zeros_like(key_shape),
        "best": np.asarray(0.0, np.float64),
    }
    state, extra = load_checkpoint(path, template_state, extra_template)
    rng = jax.random.wrap_key_data(np.asarray(extra["rng"]).astype(key_shape.dtype))
    best = float(extra["best"])
    return state, int(extra["epoch"]), rng, (None if np.isnan(best) else best)
