"""Checkpoint discovery + batch re-evaluation harness.

Reference: utils/visualisations.py:776-959 (``evaluate_models``) walks run
directories, reloads every discovered checkpoint, and recomputes probes/plots.
Here checkpoints are orbax dirs written by the experiment drivers
(``ckpt_seed{N}/best`` and ``final_seed{N}``)."""
from __future__ import annotations

import os
import re
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from avmnist_tpu.eval.probes import knn_probe, train_linear_probe
from avmnist_tpu.objectives.common import Objective
from avmnist_tpu.train.checkpoint import load_checkpoint
from avmnist_tpu.train.experiment import _probe_features

_CKPT_PATTERNS = (re.compile(r"ckpt_seed(\d+)$"), re.compile(r"final_seed(\d+)$"))


def discover_checkpoints(run_dir: str) -> Dict[int, str]:
    """Map seed -> checkpoint dir found under a run directory (best preferred)."""
    found: Dict[int, str] = {}
    for root, dirs, files in os.walk(run_dir):
        base = os.path.basename(root)
        for pat in _CKPT_PATTERNS:
            m = pat.match(base)
            if m:
                seed = int(m.group(1))
                best = os.path.join(root, "best")
                path = best if os.path.isdir(best) else root
                # prefer 'ckpt_seedN/best' over 'final_seedN'
                if seed not in found or base.startswith("ckpt"):
                    found[seed] = path
    return found


def evaluate_models(
    objective: Objective,
    template_state,
    run_dir: str,
    train_split,
    val_split,
    test,
    downstream_epochs: int = 10,
    feature_fn=None,
) -> Dict[int, Dict[str, float]]:
    """Reload every discovered checkpoint and recompute kNN + MLP probe accuracy
    (the visualisations.py re-evaluation harness, minus plotting)."""
    results: Dict[int, Dict[str, float]] = {}
    for seed, path in sorted(discover_checkpoints(run_dir).items()):
        state = load_checkpoint(path, template_state)
        tf, tl = _probe_features(objective, state, train_split, feature_fn=feature_fn)
        vf, vl = _probe_features(objective, state, val_split, feature_fn=feature_fn)
        sf, sl = _probe_features(objective, state, test, feature_fn=feature_fn)
        knn = knn_probe(tf, tl, sf, sl, k=5)
        mlp = train_linear_probe(tf, tl, sf, sl, epochs=downstream_epochs,
                                 learning_rate=1e-3, seed=seed,
                                 select_feats=vf, select_labels=vl)
        results[seed] = {"knn_acc": knn["accuracy"], "mlp_acc": mlp["accuracy"],
                         "checkpoint": path}
    return results
