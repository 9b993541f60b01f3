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


def sample_grid(images: np.ndarray, labels: np.ndarray, n: int = 16,
                dirpath: str = "plots", name: str = "samples") -> Optional[str]:
    """Grid of input samples with labels (visualisations.py:20-145 sample grids)."""
    try:
        plt = _plt()
    except Exception:  # pragma: no cover
        return None
    os.makedirs(dirpath, exist_ok=True)
    n = min(n, len(images))
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows))
    for i, ax in enumerate(np.atleast_1d(axes).ravel()):
        ax.axis("off")
        if i < n:
            ax.imshow(np.squeeze(images[i]), cmap="gray")
            ax.set_title(str(labels[i]), fontsize=8)
    path = os.path.join(dirpath, f"{name}.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def roc_auprc_plot(labels: np.ndarray, probs: np.ndarray, num_classes: int = 10,
                   dirpath: str = "plots", name: str = "roc_auprc") -> Optional[str]:
    """Per-class ROC + macro AUPRC figure (visualisations.py:147-183 / utils/AUPRC.py)."""
    try:
        from sklearn.metrics import average_precision_score, roc_curve

        plt = _plt()
    except Exception:  # pragma: no cover
        return None
    os.makedirs(dirpath, exist_ok=True)
    onehot = np.eye(num_classes)[labels.astype(int)]
    fig, ax = plt.subplots(figsize=(6, 5))
    for c in range(num_classes):
        if onehot[:, c].sum() == 0:
            continue
        fpr, tpr, _ = roc_curve(onehot[:, c], probs[:, c])
        ax.plot(fpr, tpr, lw=1, alpha=0.7, label=str(c))
    auprc = average_precision_score(onehot, probs)
    ax.plot([0, 1], [0, 1], "k--", lw=0.5)
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR")
    ax.set_title(f"per-class ROC (macro AUPRC={auprc:.3f})")
    ax.legend(fontsize=6, ncol=2)
    path = os.path.join(dirpath, f"{name}.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def convergence_analysis(metrics_df, metric: str = "train_loss",
                         tail_frac: float = 0.2) -> Optional[Dict]:
    """Per-version convergence/stability stats (plots_trials.py:100-439 analyses):
    final value, best value, tail mean/std (stability), epochs-to-90%-of-final."""
    if metrics_df is None or metric not in getattr(metrics_df, "columns", []):
        return None
    out = {}
    for version, grp in metrics_df.groupby("version"):
        vals = grp.dropna(subset=[metric])[metric].to_numpy()
        if len(vals) == 0:
            continue
        tail = vals[int(len(vals) * (1 - tail_frac)):]
        target = vals[-1] + 0.1 * abs(vals[0] - vals[-1])
        reached = np.nonzero(vals <= target)[0] if vals[0] > vals[-1] else \
            np.nonzero(vals >= target)[0]
        out[str(version)] = {
            "final": float(vals[-1]),
            "best": float(vals.min() if vals[0] > vals[-1] else vals.max()),
            "tail_mean": float(tail.mean()),
            "tail_std": float(tail.std()),
            "epochs_to_90pct": int(reached[0]) if len(reached) else len(vals),
        }
    return out


def plot_metric_heatmap(metrics_df, metric: str = "train_loss",
                        plot_dir: str = "plots") -> Optional[str]:
    """Version x epoch heatmap of a metric (plots_trials.py heatmap analysis)."""
    if metrics_df is None or metric not in getattr(metrics_df, "columns", []):
        return None
    try:
        plt = _plt()
    except Exception:  # pragma: no cover
        return None
    import pandas as pd

    pivot = (metrics_df.dropna(subset=[metric])
             .pivot_table(index="version",
                          columns="epoch" if "epoch" in metrics_df else None,
                          values=metric, aggfunc="mean"))
    os.makedirs(plot_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 1 + 0.4 * len(pivot)))
    im = ax.imshow(pivot.to_numpy(), aspect="auto", cmap="viridis")
    ax.set_yticks(range(len(pivot)), pivot.index)
    ax.set_xlabel("epoch")
    fig.colorbar(im, ax=ax, label=metric)
    path = os.path.join(plot_dir, f"{metric}_heatmap.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_study_trials(trials, plots_path: str) -> Optional[str]:
    """Search-study value plot (create_plots_for_study analog, plots_trials.py:426-439;
    works on optuna studies or the fallback StudyResult trial dicts)."""
    try:
        plt = _plt()
    except Exception:  # pragma: no cover
        return None
    if hasattr(trials, "trials"):
        trials = [{"number": getattr(t, "number", i),
                   "value": (t.get("value") if isinstance(t, dict)
                             else getattr(t, "value", None))}
                  for i, t in enumerate(trials.trials)]
    values = [(t["number"], t["value"]) for t in trials
              if t.get("value") == t.get("value") and t.get("value") is not None]
    if not values:
        return None
    os.makedirs(plots_path, exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot([n for n, _ in values], [v for _, v in values], "o-")
    ax.set_xlabel("trial")
    ax.set_ylabel("objective value")
    path = os.path.join(plots_path, "study_trials.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def _normalize_trials(trials) -> List[Dict]:
    """Accept an optuna Study, a list of optuna FrozenTrials, or fallback
    StudyResult trial dicts; return [{number, value, params}] for finished trials."""
    if hasattr(trials, "trials"):
        trials = trials.trials
    out = []
    for i, t in enumerate(trials):
        if isinstance(t, dict):
            rec = {"number": t.get("number", i), "value": t.get("value"),
                   "params": t.get("params", {})}
        else:
            rec = {"number": getattr(t, "number", i), "value": getattr(t, "value", None),
                   "params": dict(getattr(t, "params", {}) or {})}
        v = rec["value"]
        if v is not None and v == v:  # finished, non-NaN
            out.append(rec)
    return out


def _param_matrix(trials: List[Dict]):
    """Encode trial params into a numeric matrix (categoricals -> codes).
    Returns (names, X, values)."""
    names = sorted({k for t in trials for k in t["params"]})
    codes: Dict[str, Dict] = {}
    X = np.zeros((len(trials), len(names)))
    for i, t in enumerate(trials):
        for j, nm in enumerate(names):
            v = t["params"].get(nm)
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                X[i, j] = float(v)
            else:  # categorical (str/bool/list) -> stable integer code
                key = repr(v)
                X[i, j] = codes.setdefault(nm, {}).setdefault(
                    key, len(codes.get(nm, {})))
    values = np.asarray([t["value"] for t in trials], dtype=float)
    return names, X, values


def plot_parallel_coordinates(trials, plots_path: str,
                              name: str = "parallel_coordinates.png") -> Optional[str]:
    """Parallel-coordinates plot of the search space, lines colored by objective
    value (reference plots_trials.py:426-439 `create_plots_for_study` via
    optuna.visualization.matplotlib.plot_parallel_coordinate; rebuilt natively so
    it also works for the no-optuna fallback engine)."""
    try:
        plt = _plt()
    except Exception:  # pragma: no cover
        return None
    trials = _normalize_trials(trials)
    if len(trials) < 2:
        return None
    names, X, values = _param_matrix(trials)
    if not names:
        return None
    # min-max normalize each axis (constant axes -> 0.5)
    lo, hi = X.min(axis=0), X.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    Xn = np.where(hi > lo, (X - lo) / span, 0.5)
    os.makedirs(plots_path, exist_ok=True)
    fig, ax = plt.subplots(figsize=(max(8, 1.2 * len(names)), 5))
    vlo, vhi = float(values.min()), float(values.max())
    vspan = (vhi - vlo) or 1.0
    cmap = plt.get_cmap("viridis")
    order = np.argsort(values)  # draw best last
    for i in order:
        ax.plot(range(len(names)), Xn[i], color=cmap((values[i] - vlo) / vspan),
                alpha=0.6)
    for j, nm in enumerate(names):
        ax.axvline(j, color="grey", lw=0.5)
        ax.text(j, -0.06, f"{lo[j]:.3g}", ha="center", va="top", fontsize=7,
                transform=ax.get_xaxis_transform())
        ax.text(j, 1.01, f"{hi[j]:.3g}", ha="center", va="bottom", fontsize=7,
                transform=ax.get_xaxis_transform())
    ax.set_xticks(range(len(names)), names, rotation=30, ha="right")
    ax.set_yticks([])
    ax.set_title("Parallel coordinates (color = objective value)")
    sm = plt.cm.ScalarMappable(cmap=cmap,
                               norm=plt.Normalize(vmin=vlo, vmax=vhi))
    fig.colorbar(sm, ax=ax, label="objective value")
    path = os.path.join(plots_path, name)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_param_importances(trials, plots_path: str,
                           name: str = "param_importances.png") -> Optional[str]:
    """Hyperparameter-importance bar chart (plots_trials.py:426-439 via
    optuna.visualization.matplotlib.plot_param_importances). Importances come from a
    random-forest fit of objective value on encoded params (sklearn analog of
    optuna's default fANOVA evaluator), falling back to |correlation| when sklearn
    is unavailable or the trial count is tiny."""
    try:
        plt = _plt()
    except Exception:  # pragma: no cover
        return None
    trials = _normalize_trials(trials)
    if len(trials) < 3:
        return None
    names, X, values = _param_matrix(trials)
    if not names:
        return None
    varying = [j for j in range(len(names)) if X[:, j].std() > 0]
    if not varying:
        return None
    names = [names[j] for j in varying]
    X = X[:, varying]
    importances = None
    if len(trials) >= 5:
        try:
            from sklearn.ensemble import RandomForestRegressor

            rf = RandomForestRegressor(n_estimators=64, random_state=0)
            rf.fit(X, values)
            importances = rf.feature_importances_
        except Exception:
            importances = None
    if importances is None:  # tiny studies: |Pearson| as importance
        xs = (X - X.mean(axis=0)) / np.where(X.std(axis=0) > 0, X.std(axis=0), 1.0)
        vs = (values - values.mean()) / (values.std() or 1.0)
        importances = np.abs(xs.T @ vs) / len(values)
        total = importances.sum() or 1.0
        importances = importances / total
    order = np.argsort(importances)
    os.makedirs(plots_path, exist_ok=True)
    fig, ax = plt.subplots(figsize=(7, 1 + 0.4 * len(names)))
    ax.barh(range(len(names)), importances[order])
    ax.set_yticks(range(len(names)), [names[j] for j in order])
    ax.set_xlabel("importance")
    ax.set_title("Hyperparameter importances")
    path = os.path.join(plots_path, name)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def create_plots_for_study(study_or_trials, plots_path: str) -> List[str]:
    """Full search-study plot bundle (reference plots_trials.py:426-439): trial
    values + parallel coordinates + param importances."""
    out = [plot_study_trials(study_or_trials, plots_path),
           plot_parallel_coordinates(study_or_trials, plots_path),
           plot_param_importances(study_or_trials, plots_path)]
    return [p for p in out if p]


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
