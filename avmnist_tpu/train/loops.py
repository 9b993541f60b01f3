"""Generic training/eval loops: one implementation instead of the reference's five
copies (dino_train.py / ssl_train.py / centralnet_train.py / unimodal.py / notebooks).

The loop stays off the critical path: batches stream through ``prefetch_to_device``
(pre-sharded over the mesh), the jitted step runs async, and metrics are only pulled
to host once per epoch.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avmnist_tpu.data.datasets import Batches, prefetch_to_device
from avmnist_tpu.objectives.common import Objective
from avmnist_tpu.parallel.mesh import batch_sharding, replicate_state
from avmnist_tpu.train.state import TrainState


def run_epoch(
    objective: Objective,
    state: TrainState,
    batches: Iterable[Dict],
    rng,
    mesh=None,
) -> tuple:
    """One training epoch. Returns (state, mean-metrics dict, wall stats)."""
    sharding = batch_sharding(mesh) if mesh is not None else None
    metric_sums: Dict[str, Any] = {}
    n = 0
    t0 = time.perf_counter()
    for batch in prefetch_to_device(batches, size=2, sharding=sharding):
        rng, step_rng = jax.random.split(rng)
        state, metrics = objective.step_fn(state, batch, step_rng)
        for k, v in metrics.items():
            metric_sums[k] = metric_sums.get(k, 0.0) + v
        n += 1
    # Single host sync per epoch.
    means = {k: float(jax.device_get(v)) / n for k, v in metric_sums.items()}
    wall = time.perf_counter() - t0
    means["epoch_time"] = wall
    means["avg_batch_time"] = wall / max(n, 1)
    # pairs/sec — the BASELINE.json primary throughput counter (SURVEY.md §5 tracing)
    means["samples_per_sec"] = n * getattr(batches, "batch_size", 0) / max(wall, 1e-9)
    return state, means, rng


def evaluate(
    objective: Objective,
    state: TrainState,
    batches: Iterable[Dict],
    mesh=None,
) -> Dict[str, Any]:
    """Exact eval over a (padded) split: returns mean loss, accuracy, preds/probs."""
    sharding = batch_sharding(mesh) if mesh is not None else None
    losses, n_correct, n_total = [], 0, 0
    all_logits, all_labels = [], []
    for batch in prefetch_to_device(batches, size=2, sharding=sharding):
        out = objective.eval_fn(state, batch)
        valid = int(jax.device_get(batch["valid"])) if "valid" in batch else len(batch["label"])
        logits = np.asarray(jax.device_get(out["logits"]))[:valid]
        labels = np.asarray(jax.device_get(batch["label"]))[:valid]
        losses.append(float(jax.device_get(out["loss"])))
        n_correct += int((logits.argmax(-1) == labels).sum())
        n_total += valid
        all_logits.append(logits)
        all_labels.append(labels)
    logits = np.concatenate(all_logits) if all_logits else np.zeros((0, 1))
    labels = np.concatenate(all_labels) if all_labels else np.zeros((0,), int)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    return {
        "loss": float(np.mean(losses)) if losses else float("nan"),
        "accuracy": 100.0 * n_correct / max(n_total, 1),
        "preds": logits.argmax(-1),
        "probs": probs,
        "labels": labels,
    }


def fit(
    objective: Objective,
    train_data,
    epochs: int,
    batch_size: int = 128,
    seed: int = 1,
    mesh=None,
    val_data=None,
    logger=None,
    on_epoch_end: Optional[Callable[[int, TrainState, Dict], Dict]] = None,
    state: Optional[TrainState] = None,
) -> tuple:
    """Full training run. ``on_epoch_end(epoch, state, metrics) -> extra metrics`` is
    the hook used for per-epoch probes / best-checkpoint tracking (the analog of
    Lightning callbacks + on_train_epoch_end)."""
    rng = jax.random.key(seed)
    if state is None:
        rng, init_rng = jax.random.split(rng)
        state = objective.init_fn(init_rng)
    if mesh is not None:
        state = replicate_state(state, mesh)
    batches = Batches(train_data, batch_size=batch_size, shuffle=True, seed=seed)
    history: List[Dict] = []
    t_start = time.perf_counter()
    for epoch in range(epochs):
        state, metrics, rng = run_epoch(objective, state, batches, rng, mesh)
        if val_data is not None and objective.eval_fn is not None:
            val_batches = Batches(val_data, batch_size=batch_size, shuffle=False,
                                  drop_remainder=True, pad_final=True)
            val = evaluate(objective, state, val_batches, mesh)
            metrics["val_loss"] = val["loss"]
            metrics["val_accuracy"] = val["accuracy"]
        if on_epoch_end is not None:
            metrics.update(on_epoch_end(epoch, state, metrics) or {})
        metrics["epoch"] = epoch
        history.append(metrics)
        if logger is not None:
            logger.log_metrics(metrics, step=int(jax.device_get(state.step)))
    total = time.perf_counter() - t_start
    if logger is not None:
        logger.log_metrics({"total_training_time": total})
        logger.save()
    return state, history
