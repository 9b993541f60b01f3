"""YAML config surface, schema-compatible with the reference configs.

The reference drives everything from ``configs/config_multimodal_dino.yaml``
(sections home_dir/data/experiment/hardware/hyperparameters/best_augments/logs/model/
optuna; reference configs/config_multimodal_dino.yaml:1-313) plus SLURM env detection
(configs/update_config.py:3-15). We keep the exact section/key names so reference
configs load unchanged; TPU-specific hardware keys are additive.
"""
from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml

_DEFAULT = {
    "home_dir": "./",
    "data": {"data_dir": "./data/avmnist/"},
    "experiment": {"seed": 1, "seeds": [1, 2, 3]},
    "hardware": {
        "device": "tpu",
        "num_gpus": 0,          # kept for reference-config compatibility
        "num_chips": 0,         # 0 = use all visible devices
        "num_workers": 0,       # host prefetch depth (no worker processes in JAX)
        "model_parallel": 1,    # TP axis size (mesh 'model' axis)
    },
    "hyperparameters": {
        "batch_size": 128,
        "data_augmentation": "burst_noise",
        "learning_rate": 0.0001,
        "num_epochs": 100,
        "projection_dim": 128,
        "output_dim": 256,
        "encoder_output_dim": 256,
        "momentum": 0.996,
        "center_momentum": 0.9,
        "n_global_views": 2,
        "n_local_views": 4,
        "student_temperature": 0.1,
        "teacher_temperature": 0.04,
        "weight_decay": 0.000001,
        "cosine_loss_alpha": 0,
        "dropout": 0.3,
        "metric": "mlp_acc",
        "alpha": 1.0,           # hybrid-loss weight (mse/infonce/semi_supervised)
    },
    "best_augments": None,
    "logs": {"log_dir": "./runs/logs/"},
    "model": {
        "model_dir_data": "./runs/data/",
        "model_dir_scratch": "./runs/scratch/",
        "name": "unknown",
        "num_classes": 10,
    },
    "optuna": {"epochs_per_trial": 50, "n_trials": 20},
    # framework-specific switches (absent from reference configs; defaults preserve
    # reference-faithful quirks, see SURVEY.md §7 "hard parts" item 5)
    "reference_faithful": {
        "l2_normalize_before_softmax": True,   # dino.py:831-832
        "include_same_view_pairs": True,       # dino.py:843-847
        "unimodal_double_centering": True,     # dino.py:1388 + :1613
        "teacher_ema_before_optimizer": True,  # dino.py:871
        # MLP probes extract train-split features with the encoder in TRAIN mode
        # (batch-stat BN + dropout, probe-local running-stat updates) and eval
        # splits with the updated stats — dino.py:888-917 semantics. False = eval
        # -mode cached features everywhere (round-1 behavior, lower variance).
        "probe_bn_train_mode": True,
    },
}


def default_config() -> Dict[str, Any]:
    return copy.deepcopy(_DEFAULT)


def _deep_update(base: Dict, new: Dict) -> Dict:
    for k, v in (new or {}).items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


def load_config(path: Optional[str] = None) -> Dict[str, Any]:
    """Load a YAML config over the defaults (unknown keys pass through untouched)."""
    cfg = default_config()
    if path:
        with open(path) as f:
            _deep_update(cfg, yaml.safe_load(f) or {})
    return cfg


def save_config(cfg: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def update_hardware_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Env-driven hardware detection (reference update_config.py:3-15 reads SLURM vars).

    Honors SLURM vars when present for drop-in cluster compat, plus TPU env.
    """
    hw = cfg.setdefault("hardware", {})
    if "SLURM_CPUS_PER_TASK" in os.environ:
        hw["num_workers"] = int(os.environ["SLURM_CPUS_PER_TASK"])
    if "SLURM_GPUS" in os.environ:
        hw["num_gpus"] = int(os.environ["SLURM_GPUS"])
    if "TPU_CHIPS" in os.environ:
        hw["num_chips"] = int(os.environ["TPU_CHIPS"])
    return cfg


def setup_jax() -> None:
    """Process-global JAX setup for CLI entry points (NOT config normalization —
    kept out of update_hardware_config so library callers/tests normalizing a
    config dict don't mutate global JAX state, ADVICE r2).

    Persistent XLA compile cache: first-compile of the whole-epoch programs is
    minutes; identical reruns should pay zero."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
