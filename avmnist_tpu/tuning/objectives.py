"""Tuning objective builders — the mapping to the reference's
hyperparameter_tuning/objective_dino.py:9-160 and objective_augment.py:98-143.

The reference builds a Lightning model + datamodule per trial and fits with a pruning
callback + EarlyStopping(patience=5) on the monitored metric. Here the equivalent is a
closure over a DINO objective factory: suggest -> build -> short fit with the
per-epoch MLP probe -> best metric value (NaN on failure). The CLI
(cli/run_dino.py trial_train) wires these to the search drivers in tuning/search.py;
this module provides the standalone, reusable form.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax


def make_dino_trial_objective(
    base_dino_config,
    train_split,
    val_split,
    metric: str = "mlp_acc",
    epochs_per_trial: int = 10,
    batch_size: int = 128,
    patience: int = 5,
    mesh=None,
):
    """Returns trial_fn(hparam_overrides_or_augments, trial, is_augment) -> metric.

    Early stopping: stop when the metric hasn't improved for ``patience`` epochs
    (objective_dino.py EarlyStopping(patience=5)); pruning hook: trial.report +
    trial.should_prune when the trial object supports it."""
    from avmnist_tpu.objectives.dino import make_dino_objective
    from avmnist_tpu.train.experiment import make_mlp_probe_hook
    from avmnist_tpu.train.loops import fit

    maximize = metric == "mlp_acc"

    def trial_fn(overrides, trial=None, is_augment: bool = False) -> float:
        cfg = base_dino_config
        if is_augment:
            cfg = dataclasses.replace(cfg, best_augments=overrides)
        else:
            valid = {f.name for f in dataclasses.fields(type(cfg))}
            cfg = dataclasses.replace(
                cfg, **{k: v for k, v in (overrides or {}).items() if k in valid})
        objective = make_dino_objective(cfg, mesh=mesh)
        hook = make_mlp_probe_hook(objective, train_split, val_split,
                                   learning_rate=cfg.learning_rate)
        best: Optional[float] = None
        since_best = 0
        history = []

        def on_epoch_end(epoch, state, metrics):
            nonlocal best, since_best
            extra = hook(epoch, state, metrics)
            value = {**metrics, **extra}.get(metric)
            history.append(value)
            if trial is not None and hasattr(trial, "report"):
                trial.report(value, epoch)
            improved = (best is None or
                        (value > best if maximize else value < best))
            if improved:
                best, since_best = value, 0
            else:
                since_best += 1
            return extra

        bs = (overrides or {}).get("batch_size", batch_size) if not is_augment \
            else batch_size
        try:
            fit(objective, train_split, epochs=epochs_per_trial, batch_size=bs,
                seed=1, mesh=mesh, on_epoch_end=on_epoch_end)
        except Exception as e:  # NaN-on-failure (objective_dino.py:158-160)
            print(f"trial failed: {e}")
            return float("nan")
        return best if best is not None else float("nan")

    return trial_fn
