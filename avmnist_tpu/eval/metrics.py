"""Classification metrics + artifact writers.

Matches ``compute_classification_metrics`` (dino_train.py:47-102: confusion matrix,
accuracy, per-class accuracy, sklearn classification report, preds/probs) and the
per-sample prediction CSVs ``true,pred,probs`` (dino_train.py:322-326,
centralnet_train.py:152-166)."""
from __future__ import annotations

import csv
import os
from typing import Dict, Optional, Sequence

import numpy as np


def confusion_matrix(labels: np.ndarray, preds: np.ndarray, num_classes: int = 10) -> np.ndarray:
    cm = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(cm, (labels.astype(int), preds.astype(int)), 1)
    return cm


def compute_classification_metrics(
    labels: np.ndarray,
    preds: np.ndarray,
    probs: Optional[np.ndarray] = None,
    num_classes: int = 10,
) -> Dict:
    cm = confusion_matrix(labels, preds, num_classes)
    with np.errstate(invalid="ignore", divide="ignore"):
        per_class_acc = np.where(cm.sum(1) > 0, np.diag(cm) / cm.sum(1), 0.0)
    out = {
        "accuracy": 100.0 * float((preds == labels).mean()) if len(labels) else 0.0,
        "confusion_matrix": cm,
        "per_class_accuracy": per_class_acc,
    }
    try:
        from sklearn.metrics import classification_report

        out["report"] = classification_report(labels, preds, zero_division=0)
    except Exception:
        out["report"] = ""
    if probs is not None:
        try:
            from sklearn.metrics import average_precision_score

            onehot = np.eye(num_classes)[labels.astype(int)]
            out["auprc"] = float(average_precision_score(onehot, probs))
        except Exception:
            pass
    return out


def auprc(labels: np.ndarray, probs: np.ndarray, num_classes: int = 10) -> float:
    """Macro average precision (reference utils/AUPRC.py:4-20)."""
    from sklearn.metrics import average_precision_score

    onehot = np.eye(num_classes)[labels.astype(int)]
    return float(average_precision_score(onehot, probs))


def write_prediction_csv(path: str, labels: np.ndarray, preds: np.ndarray,
                         probs: np.ndarray) -> str:
    """Per-sample ``true_label,predicted_label,probabilities`` dump (reference
    dino_train.py:322-326 / load_results_from_csv get_data.py:833-840 format)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["true_label", "predicted_label", "probabilities"])
        for t, p, pr in zip(labels, preds, probs):
            w.writerow([int(t), int(p), str([float(x) for x in pr])])
    return path


def load_results_from_csv(csv_file: str):
    """Read a per-sample prediction CSV back into (labels, probs) — the reference's
    loader for its own artifact format (get_data.py:833-840)."""
    import ast

    labels, probs = [], []
    with open(csv_file) as f:
        reader = csv.DictReader(f)
        for row in reader:
            labels.append(int(row["true_label"]))
            probs.append(ast.literal_eval(row["probabilities"]))
    return np.asarray(labels), np.asarray(probs)


def summarize_seeds(results: Dict[str, Sequence[float]]) -> Dict[str, str]:
    """mean ± std strings for the performance_summary.txt writers."""
    return {
        k: f"{np.mean(v):.2f} ± {np.std(v):.2f}" for k, v in results.items() if len(v)
    }


def write_performance_summary(path: str, model_name: str,
                              results: Dict[str, Sequence[float]],
                              extra_lines: Sequence[str] = ()) -> str:
    """Human-readable multi-seed summary (run_dino.py:438-474, ssl_train.py:203-223)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    lines = [f"Performance summary for {model_name}", "=" * 40]
    for k, v in summarize_seeds(results).items():
        lines.append(f"{k}: {v} (n={len(results[k])})")
    lines.extend(extra_lines)
    with open(path, "w") as f:
        f.write("\n".join(str(l) for l in lines) + "\n")
    return path
