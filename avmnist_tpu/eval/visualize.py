"""Host-side visualization suite (reference utils/visualisations.py + plots_trials.py).

Operates on pre-extracted feature/label arrays rather than torch models; the TPU side
already caches features for the probes, so plotting reuses them.

Matplotlib/sklearn are imported lazily — headless environments without them can still
train; plots are skipped with a warning.
"""
from __future__ import annotations

import os
import warnings
from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def pca_plot(features: np.ndarray, labels: np.ndarray,
             selected_digits: Sequence[int] = (5, 8),
             dirpath: str = "pca_plots", name: str = "pca") -> Optional[str]:
    """2-component PCA scatter of selected digits (visualisations.py:254-362)."""
    try:
        from sklearn.decomposition import PCA

        plt = _plt()
    except Exception as e:  # pragma: no cover
        warnings.warn(f"plotting unavailable: {e}")
        return None
    mask = np.isin(labels, selected_digits)
    if mask.sum() < 3:
        return None
    p = PCA(n_components=2).fit_transform(features[mask])
    os.makedirs(dirpath, exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 5))
    for d in selected_digits:
        sel = labels[mask] == d
        ax.scatter(p[sel, 0], p[sel, 1], s=6, label=str(d), alpha=0.6)
    ax.legend(title="digit")
    ax.set_title(f"PCA of frozen features ({name})")
    path = os.path.join(dirpath, f"{name}_{'_'.join(map(str, selected_digits))}.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def pca_plot_multiclass(features, labels, dirpath="pca_plots", name="pca_multiclass"):
    """All-class PCA (visualisations.py:364-467)."""
    return pca_plot(features, labels, sorted(set(labels.tolist())), dirpath, name)


def tsne_plot_multiclass(features, labels, dirpath="pca_plots",
                         name="tsne_multiclass", random_seed: int = 1,
                         max_points: int = 2000) -> Optional[str]:
    """t-SNE scatter (visualisations.py:469-568)."""
    try:
        from sklearn.manifold import TSNE

        plt = _plt()
    except Exception as e:  # pragma: no cover
        warnings.warn(f"plotting unavailable: {e}")
        return None
    if len(features) > max_points:
        idx = np.random.default_rng(random_seed).choice(len(features), max_points,
                                                        replace=False)
        features, labels = features[idx], labels[idx]
    emb = TSNE(n_components=2, random_state=random_seed,
               perplexity=min(30, max(2, len(features) // 4))).fit_transform(features)
    os.makedirs(dirpath, exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 5))
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=labels, cmap="tab10", s=6, alpha=0.6)
    fig.colorbar(sc, ax=ax, label="digit")
    ax.set_title("t-SNE of frozen features")
    path = os.path.join(dirpath, f"{name}.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def visualize_prediction_matrix(labels, preds, probs=None,
                                dirpath="confusion_matrix",
                                name="prediction_matrix") -> Optional[str]:
    """Confusion matrix + confidence analysis panel (visualisations.py:569-774)."""
    try:
        plt = _plt()
    except Exception as e:  # pragma: no cover
        warnings.warn(f"plotting unavailable: {e}")
        return None
    from avmnist_tpu.eval.metrics import confusion_matrix

    cm = confusion_matrix(labels, preds)
    os.makedirs(dirpath, exist_ok=True)
    n_panels = 2 if probs is not None else 1
    fig, axes = plt.subplots(1, n_panels, figsize=(6 * n_panels, 5))
    axes = np.atleast_1d(axes)
    im = axes[0].imshow(cm, cmap="Blues")
    axes[0].set_xlabel("predicted")
    axes[0].set_ylabel("true")
    axes[0].set_title("confusion matrix")
    fig.colorbar(im, ax=axes[0])
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            axes[0].text(j, i, str(cm[i, j]), ha="center", va="center", fontsize=7)
    if probs is not None:
        conf = probs.max(-1)
        correct = preds == labels
        axes[1].hist([conf[correct], conf[~correct]], bins=20, stacked=False,
                     label=["correct", "wrong"])
        axes[1].set_xlabel("prediction confidence")
        axes[1].legend()
        axes[1].set_title("confidence analysis")
    path = os.path.join(dirpath, f"{name}.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def load_all_versions(log_path: str):
    """Aggregate Lightning-style version_* metrics.csv files into one DataFrame
    (plots_trials.py:10-42)."""
    import pandas as pd

    frames = []
    for root, dirs, files in os.walk(log_path):
        if "metrics.csv" in files and os.path.basename(root).startswith("version"):
            df = pd.read_csv(os.path.join(root, "metrics.csv"))
            df["version"] = os.path.basename(root)
            frames.append(df)
    return pd.concat(frames, ignore_index=True) if frames else None


def save_versions_to_csv(metrics_df, log_path: str) -> Optional[str]:
    if metrics_df is None:
        return None
    path = os.path.join(log_path, "metrics_versions.csv")
    metrics_df.to_csv(path, index=False)
    return path


def plot_loss(metrics_df, plot_dir: str, metric: str = "train_loss") -> Optional[str]:
    """Per-version training-curve plot (plots_trials.py:43-100)."""
    if metrics_df is None or metric not in getattr(metrics_df, "columns", []):
        return None
    try:
        plt = _plt()
    except Exception:  # pragma: no cover
        return None
    os.makedirs(plot_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(7, 4))
    for version, grp in metrics_df.groupby("version"):
        sub = grp.dropna(subset=[metric])
        ax.plot(sub["epoch"] if "epoch" in sub else range(len(sub)), sub[metric],
                label=str(version))
    ax.set_xlabel("epoch")
    ax.set_ylabel(metric)
    ax.legend(fontsize=7)
    path = os.path.join(plot_dir, f"{metric}_curves.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def visualize_train_results(features, labels, preds, probs, log_path: str,
                            model_dir_data: str, seed: int = 1) -> List[str]:
    """The full post-training plot bundle (run_dino.py:503-526)."""
    out = []
    pca_dir = os.path.join(model_dir_data, "pca_plots")
    cm_dir = os.path.join(model_dir_data, "confusion_matrix")
    out.append(pca_plot(features, labels, (5, 8), pca_dir))
    out.append(pca_plot_multiclass(features, labels, pca_dir))
    out.append(tsne_plot_multiclass(features, labels, pca_dir, random_seed=seed))
    out.append(visualize_prediction_matrix(labels, preds, probs, cm_dir))
    df = load_all_versions(log_path)
    out.append(save_versions_to_csv(df, log_path) if df is not None else None)
    out.append(plot_loss(df, model_dir_data))
    return [p for p in out if p]
