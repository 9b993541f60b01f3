"""Search-space definitions compatible with the reference's config['optuna'] schema.

The reference declares per-hyperparameter spaces in YAML (type int/uniform/loguniform
with low/high/step; configs/config_multimodal_dino.yaml:86-313) and suggests them via
an Optuna trial (hyperparameter_tuning/objective_dino.py:9-160, objective_augment.py:8-96).
``FallbackTrial`` implements the same suggest_* surface with numpy randomness so the
whole search subsystem works without optuna installed.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import numpy as np


class FallbackTrial:
    """Duck-typed optuna.Trial: random sampling + param recording."""

    def __init__(self, rng: np.random.Generator, number: int = 0):
        self.rng = rng
        self.number = number
        self.params: Dict[str, Any] = {}

    def suggest_float(self, name, low, high, log: bool = False):
        v = (math.exp(self.rng.uniform(math.log(low), math.log(high)))
             if log else float(self.rng.uniform(low, high)))
        self.params[name] = v
        return v

    def suggest_loguniform(self, name, low, high):
        return self.suggest_float(name, low, high, log=True)

    def suggest_int(self, name, low, high, step: int = 1):
        n = (high - low) // step
        v = int(low + step * self.rng.integers(0, n + 1))
        self.params[name] = v
        return v

    def suggest_categorical(self, name, choices):
        v = choices[int(self.rng.integers(0, len(choices)))]
        self.params[name] = v
        return v

    def report(self, value, step):  # pruning no-op
        pass

    def should_prune(self) -> bool:
        return False

    def set_user_attr(self, key, value):
        pass


def suggest_hyperparameters(trial, optuna_space: Dict[str, Any]) -> Dict[str, Any]:
    """Suggest every declared hyperparameter from the config's optuna section
    (objective_dino.py behavior: each spec dict with a 'type' becomes a suggestion)."""
    out: Dict[str, Any] = {}
    for name, spec in optuna_space.items():
        if not isinstance(spec, dict) or "type" not in spec:
            continue
        t = spec["type"]
        if t == "int":
            out[name] = trial.suggest_int(name, int(spec["low"]), int(spec["high"]),
                                          step=int(spec.get("step", 1)))
        elif t == "uniform":
            out[name] = trial.suggest_float(name, float(spec["low"]), float(spec["high"]))
        elif t == "loguniform":
            out[name] = trial.suggest_float(name, float(spec["low"]), float(spec["high"]),
                                            log=True)
        elif t == "categorical":
            out[name] = trial.suggest_categorical(name, spec["choices"])
        else:
            raise ValueError(f"Unknown parameter type {t} for {name}")
    return out


def process_augment_config(trial, config: Dict, is_hyperparameter_search: bool = True
                           ) -> Optional[Dict]:
    """Augmentation config, either suggested from config['optuna']['augmentations']
    (search) or read from config['best_augments'] (final training). Same nested
    {'augmentations': ..., 'augmentation_probabilities': ...} format as the reference
    (hyperparameter_tuning/objective_augment.py:8-96)."""
    if is_hyperparameter_search:
        space = config.get("optuna", {}).get("augmentations")
        if not space:
            raise ValueError("config['optuna']['augmentations'] missing")
        augmentations = {"global_views": {}, "local_views": {}}
        probabilities = {"global_views": {}, "local_views": {}}
        for view in ("global_views", "local_views"):
            for aug, params in space.get(view, {}).items():
                aug_params = {}
                for pname, pinfo in params.items():
                    key = f"{view}.{aug}.{pname}"
                    if pname == "p":
                        probabilities[view][aug] = trial.suggest_float(
                            key, pinfo["low"], pinfo["high"])
                    elif pinfo["type"] == "uniform":
                        aug_params[pname] = trial.suggest_float(
                            key, pinfo["low"], pinfo["high"])
                    elif pinfo["type"] == "int":
                        aug_params[pname] = trial.suggest_int(
                            key, pinfo["low"], pinfo["high"],
                            step=pinfo.get("step", 1))
                    elif pinfo["type"] == "categorical":
                        aug_params[pname] = trial.suggest_categorical(
                            key, pinfo["choices"])
                    else:
                        raise ValueError(f"Unknown parameter type for {pname}")
                if aug_params:
                    augmentations[view][aug] = aug_params
        return {"augmentations": augmentations,
                "augmentation_probabilities": probabilities}
    best = config.get("best_augments")
    if not best:
        return None
    augmentations = {"global_views": {}, "local_views": {}}
    probabilities = {"global_views": {}, "local_views": {}}
    for view in ("global_views", "local_views"):
        for aug, params in (best.get(view) or {}).items():
            aug_params = {k: v for k, v in params.items() if k != "p"}
            if aug_params:
                augmentations[view][aug] = aug_params
            if "p" in params:
                probabilities[view][aug] = params["p"]
    return {"augmentations": augmentations,
            "augmentation_probabilities": probabilities}


def augment_probability_constraints(params: Dict[str, Any]):
    """TPE constraint p_local >= p_global per augmentation (run_dino.py:56-73):
    returns a list of (p_global - p_local) values; feasible when all <= 0."""
    out = []
    for name, v in params.items():
        if name.startswith("global_views.") and name.endswith(".p"):
            local = name.replace("global_views.", "local_views.")
            if local in params:
                out.append(v - params[local])
    return out
