"""Hyperparameter / augmentation search (reference run_dino.py:41-189).

Optuna path (when installed): SQLite RDBStorage with heartbeat 60s / grace 120s /
RetryFailedTrialCallback(max_retry=3), ``load_if_exists`` resume with remaining-trial
computation, TPE (with the p_local >= p_global constraint for augment search),
``study.optimize(catch=(Exception,), timeout=86400)``, best params written back into
the YAML config — all per the reference.

Fallback path (optuna absent, as in this image): random search with the same trial
surface (FallbackTrial), JSON-lines persistence for resume, the same constraint
enforced by rejection sampling, same YAML write-back. Failures return NaN and the
search continues (objective_dino.py:158-160 semantics).
"""
from __future__ import annotations

import json
import math
import os
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import yaml

from avmnist_tpu.tuning.spaces import (
    FallbackTrial,
    augment_probability_constraints,
    process_augment_config,
    suggest_hyperparameters,
)

try:  # pragma: no cover - environment-dependent
    import optuna

    HAVE_OPTUNA = True
except Exception:  # pragma: no cover
    optuna = None
    HAVE_OPTUNA = False


class StudyResult:
    def __init__(self, best_params: Dict[str, Any], best_value: float,
                 trials: List[Dict]):
        self.best_params = best_params
        self.best_value = best_value
        self.trials = trials


def _fallback_study(objective: Callable, n_trials: int, direction: str,
                    storage_path: str, constraints_func=None, seed: int = 0) -> StudyResult:
    os.makedirs(os.path.dirname(os.path.abspath(storage_path)), exist_ok=True)
    trials: List[Dict] = []
    if os.path.exists(storage_path):  # resume (load_if_exists analog)
        with open(storage_path) as f:
            trials = [json.loads(l) for l in f if l.strip()]
    rng = np.random.default_rng(seed + len(trials))
    remaining = max(n_trials - len(trials), 0)
    with open(storage_path, "a") as f:
        for i in range(remaining):
            number = len(trials)
            for _ in range(64):  # rejection-sample until constraints satisfied
                trial = FallbackTrial(rng, number)
                try:
                    value = objective(trial)
                except Exception as e:  # catch=(Exception,) semantics
                    print(f"Trial {number} failed: {e}")
                    value = float("nan")
                    break
                if constraints_func is None or all(
                        c <= 0 for c in constraints_func(trial.params)):
                    break
                # infeasible: resample without consuming a trial slot
            rec = {"number": number, "value": value, "params": trial.params}
            trials.append(rec)
            f.write(json.dumps(rec) + "\n")
            f.flush()
    sign = 1.0 if direction == "maximize" else -1.0
    valid = [t for t in trials if t["value"] == t["value"]]
    if not valid:
        return StudyResult({}, float("nan"), trials)
    best = max(valid, key=lambda t: sign * t["value"])
    return StudyResult(best["params"], best["value"], trials)


def run_study(
    objective: Callable,
    n_trials: int,
    direction: str,
    storage_dir: str,
    study_name: str,
    constraints_func=None,
    timeout: float = 86400,
    seed: int = 0,
):
    """Run (or resume) a study; returns an object with .best_params/.best_value."""
    if HAVE_OPTUNA:  # pragma: no cover - optuna not in the CI image
        storage = optuna.storages.RDBStorage(
            url=f"sqlite:///{os.path.join(storage_dir, 'optuna_studies.db')}",
            heartbeat_interval=60,
            grace_period=120,
            failed_trial_callback=optuna.storages.RetryFailedTrialCallback(max_retry=3),
        )
        sampler = optuna.samplers.TPESampler(
            seed=seed, constraints_func=(
                (lambda t: constraints_func(t.params)) if constraints_func else None))
        study = optuna.create_study(study_name=study_name, storage=storage,
                                    direction=direction, sampler=sampler,
                                    load_if_exists=True)
        done = len([t for t in study.trials
                    if t.state == optuna.trial.TrialState.COMPLETE])
        remaining = max(n_trials - done, 0)
        if remaining:
            study.optimize(objective, n_trials=remaining, timeout=timeout,
                           catch=(Exception,))
        return study
    return _fallback_study(objective, n_trials, direction,
                           os.path.join(storage_dir, f"{study_name}_trials.jsonl"),
                           constraints_func, seed)


def _write_config(config: Dict, config_path: Optional[str]):
    if config_path:
        with open(config_path, "w") as f:
            yaml.safe_dump(config, f, sort_keys=False)


def search_hyperparameters(
    config: Dict,
    trial_train_fn: Callable[[Dict[str, Any], Any], float],
    storage_dir: str,
    config_path: Optional[str] = None,
    study_name: str = "hyperparameters",
) -> Any:
    """Suggest config['optuna'] hyperparameters, train via ``trial_train_fn(hparams,
    trial) -> metric``, write best params back into config['hyperparameters'] + YAML
    (run_dino.py:136-189)."""
    metric = config["hyperparameters"].get("metric", "mlp_acc")
    direction = "maximize" if metric == "mlp_acc" else "minimize"

    def objective(trial):
        hparams = suggest_hyperparameters(trial, config.get("optuna", {}))
        return trial_train_fn(hparams, trial)

    study = run_study(objective, int(config.get("optuna", {}).get("n_trials", 20)),
                      direction, storage_dir, study_name)
    best = dict(getattr(study, "best_params", {}) or {})
    config["hyperparameters"].update(best)
    _write_config(config, config_path)
    return study


def search_augmentation_hyperparameters(
    config: Dict,
    trial_train_fn: Callable[[Dict, Any], float],
    storage_dir: str,
    config_path: Optional[str] = None,
    study_name: str = "augmentations",
) -> Any:
    """Search augmentation params with the p_local >= p_global constraint; write the
    winning nested best_augments dict back into the YAML (run_dino.py:41-135)."""
    metric = config["hyperparameters"].get("metric", "mlp_acc")
    direction = "maximize" if metric == "mlp_acc" else "minimize"

    def objective(trial):
        augment_values = process_augment_config(trial, config,
                                                is_hyperparameter_search=True)
        return trial_train_fn(augment_values, trial)

    study = run_study(objective, int(config.get("optuna", {}).get("n_trials", 20)),
                      direction, storage_dir, study_name,
                      constraints_func=augment_probability_constraints)
    best = getattr(study, "best_params", {}) or {}
    # fold flat "view.aug.param" keys back into the nested best_augments format
    nested: Dict[str, Dict[str, Dict[str, Any]]] = {"global_views": {},
                                                    "local_views": {}}
    for key, value in best.items():
        view, aug, param = key.split(".", 2)
        nested.setdefault(view, {}).setdefault(aug, {})[param] = value
    if any(nested.values()):
        config["best_augments"] = nested
    _write_config(config, config_path)
    return study
