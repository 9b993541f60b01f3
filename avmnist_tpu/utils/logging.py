"""Metrics logging with the reference's artifact formats.

Two formats coexist in the reference and both are reproduced:
1. Lightning CSVLogger layout: ``{log_dir}/version_{v}/metrics.csv`` + ``hparams.yaml``
   with sparse columns (run_dino.py:355; sample header:
   ``epoch,step,train_loss_epoch,train_loss_step``).
2. Imperative CSV logs whose header row embeds a JSON-ish metadata comment
   (dino_train.py:130-132, centralnet_train.py:30-43).
"""
from __future__ import annotations

import csv
import json
import os
from typing import Any, Dict, List, Optional

import yaml


class CSVLogger:
    """Lightning-CSVLogger-compatible: accumulates rows with sparse columns, flushes to
    ``{save_dir}/{name}/version_{v}/metrics.csv``."""

    def __init__(self, save_dir: str, name: str = "", version: Optional[Any] = None):
        base = os.path.join(save_dir, name) if name else save_dir
        if version is None:
            existing = [d for d in (os.listdir(base) if os.path.isdir(base) else [])
                        if d.startswith("version_")]
            version = len(existing)
        self.log_dir = os.path.join(base, f"version_{version}")
        os.makedirs(self.log_dir, exist_ok=True)
        self.metrics_path = os.path.join(self.log_dir, "metrics.csv")
        self._rows: List[Dict[str, Any]] = []
        self._keys: List[str] = []

    def log_metrics(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        row = {k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()}
        if step is not None:
            row.setdefault("step", step)
        for k in row:
            if k not in self._keys:
                self._keys.append(k)
        self._rows.append(row)

    def log_hyperparams(self, hparams: Dict[str, Any]) -> None:
        with open(os.path.join(self.log_dir, "hparams.yaml"), "w") as f:
            yaml.safe_dump(hparams, f, sort_keys=False)

    def save(self) -> str:
        with open(self.metrics_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._keys)
            writer.writeheader()
            writer.writerows(self._rows)
        return self.metrics_path

    finalize = save


class MetadataCSV:
    """Imperative-loop CSV with a JSON metadata comment appended to the header row
    (matches dino_train.py:130-132 / centralnet_train.py:40-43)."""

    def __init__(self, path: str, columns: List[str], metadata: Dict[str, Any]):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(columns + ["# " + json.dumps(metadata)])

    def append(self, row: List[Any]) -> None:
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerow(row)
