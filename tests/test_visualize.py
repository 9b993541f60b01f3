import numpy as np
import pytest

from avmnist_tpu.eval import visualize as V


@pytest.fixture()
def feats():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 10, 120)
    centers = rng.normal(size=(10, 16)) * 4
    features = centers[labels] + rng.normal(size=(120, 16))
    probs = rng.dirichlet(np.ones(10), 120)
    preds = probs.argmax(-1)
    return features.astype(np.float32), labels, preds, probs


def test_pca_tsne_confusion(tmp_path, feats):
    features, labels, preds, probs = feats
    assert V.pca_plot(features, labels, (5, 8), str(tmp_path)) is not None
    assert V.pca_plot_multiclass(features, labels, str(tmp_path)) is not None
    assert V.tsne_plot_multiclass(features, labels, str(tmp_path), max_points=60) is not None
    assert V.visualize_prediction_matrix(labels, preds, probs, str(tmp_path)) is not None


def test_sample_grid_and_roc(tmp_path, feats):
    _, labels, preds, probs = feats
    imgs = np.random.default_rng(1).uniform(size=(20, 28, 28))
    assert V.sample_grid(imgs, labels[:20], dirpath=str(tmp_path)) is not None
    assert V.roc_auprc_plot(labels, probs, dirpath=str(tmp_path)) is not None


def test_versions_aggregation_and_convergence(tmp_path):
    import pandas as pd

    for v in (0, 1):
        d = tmp_path / f"version_{v}"
        d.mkdir()
        pd.DataFrame({"epoch": range(10),
                      "train_loss": np.linspace(2.0 - v * 0.5, 0.5, 10)}).to_csv(
            d / "metrics.csv", index=False)
    df = V.load_all_versions(str(tmp_path))
    assert len(df) == 20
    assert V.save_versions_to_csv(df, str(tmp_path)) is not None
    assert V.plot_loss(df, str(tmp_path)) is not None
    conv = V.convergence_analysis(df)
    assert set(conv) == {"version_0", "version_1"}
    assert conv["version_0"]["final"] == pytest.approx(0.5)
    assert V.plot_metric_heatmap(df, plot_dir=str(tmp_path)) is not None


def test_plot_study_trials(tmp_path):
    trials = [{"number": i, "value": float(i) if i != 2 else float("nan")}
              for i in range(5)]
    assert V.plot_study_trials(trials, str(tmp_path)) is not None


def test_study_plot_suite(tmp_path):
    """Optuna plot-suite parity (plots_trials.py:426-439): parallel coordinates +
    param importances from both dict-trials (fallback engine) and object-trials."""
    rng = np.random.default_rng(0)
    trials = []
    for i in range(12):
        lr = float(10 ** rng.uniform(-5, -2))
        bs = int(rng.choice([128, 192, 256]))
        scale = rng.choice(["a", "b"])
        value = -np.log10(lr) + 0.01 * bs + (0.5 if scale == "a" else 0.0)
        trials.append({"number": i, "value": float(value),
                       "params": {"learning_rate": lr, "batch_size": bs,
                                  "scale": scale}})
    trials.append({"number": 12, "value": float("nan"), "params": {}})  # failed trial
    out = V.create_plots_for_study(trials, str(tmp_path))
    names = {V.os.path.basename(p) for p in out}
    assert "parallel_coordinates.png" in names
    assert "param_importances.png" in names
    assert "study_trials.png" in names

    class T:  # optuna FrozenTrial-shaped
        def __init__(self, t):
            self.number, self.value, self.params = t["number"], t["value"], t["params"]

    frozen = [T(t) for t in trials]

    class Study:
        pass

    Study.trials = frozen

    assert V.plot_parallel_coordinates(Study(), str(tmp_path / "obj")) is not None
    assert V.plot_param_importances(Study(), str(tmp_path / "obj")) is not None


def test_study_plots_degenerate(tmp_path):
    # <2 finished trials or no params -> None, no crash
    assert V.plot_parallel_coordinates([{"number": 0, "value": 1.0, "params": {}}],
                                       str(tmp_path)) is None
    assert V.plot_param_importances([], str(tmp_path)) is None
