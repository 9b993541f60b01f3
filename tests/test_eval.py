import numpy as np

from avmnist_tpu.eval.metrics import (
    compute_classification_metrics,
    confusion_matrix,
    summarize_seeds,
    write_performance_summary,
    write_prediction_csv,
)
from avmnist_tpu.eval.probes import knn_probe, train_linear_probe


_CENTERS = {}


def clustered_features(n=600, d=32, n_classes=10, sep=3.0, seed=0):
    # class centers are shared across calls (train/val must come from one distribution)
    if (d, n_classes, sep) not in _CENTERS:
        _CENTERS[(d, n_classes, sep)] = np.random.default_rng(42).normal(
            size=(n_classes, d)) * sep
    centers = _CENTERS[(d, n_classes, sep)]
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, n)
    feats = centers[labels] + rng.normal(size=(n, d))
    return feats.astype(np.float32), labels.astype(np.int64)


def test_linear_probe_learns_separable():
    tf, tl = clustered_features(seed=0)
    vf, vl = clustered_features(n=200, seed=1)
    out = train_linear_probe(tf, tl, vf, vl, epochs=10, learning_rate=1e-2)
    assert out["accuracy"] > 90.0
    assert out["preds"].shape == (200,)
    assert np.allclose(out["probs"].sum(-1), 1.0, atol=1e-4)


def test_knn_probe():
    tf, tl = clustered_features(seed=0)
    vf, vl = clustered_features(n=200, seed=1)
    out = knn_probe(tf, tl, vf, vl, k=5)
    assert out["accuracy"] > 90.0


def test_knn_matches_sklearn():
    from sklearn.neighbors import KNeighborsClassifier

    tf, tl = clustered_features(n=300, sep=1.0, seed=2)
    vf, vl = clustered_features(n=100, sep=1.0, seed=3)
    ours = knn_probe(tf, tl, vf, vl, k=5)["preds"]
    sk = KNeighborsClassifier(n_neighbors=5).fit(tf, tl).predict(vf)
    assert (ours == sk).mean() > 0.97  # identical up to distance ties


def test_confusion_and_metrics():
    labels = np.array([0, 0, 1, 1, 2])
    preds = np.array([0, 1, 1, 1, 2])
    m = compute_classification_metrics(labels, preds, num_classes=3)
    assert m["accuracy"] == 80.0
    cm = m["confusion_matrix"]
    assert cm[0, 0] == 1 and cm[0, 1] == 1 and cm[1, 1] == 2 and cm[2, 2] == 1
    assert m["per_class_accuracy"][1] == 1.0


def test_artifact_writers(tmp_path):
    labels = np.array([0, 1])
    preds = np.array([0, 1])
    probs = np.eye(2)
    p = write_prediction_csv(str(tmp_path / "preds.csv"), labels, preds, probs)
    lines = open(p).read().splitlines()
    assert lines[0] == "true_label,predicted_label,probabilities"
    s = summarize_seeds({"mlp_acc": [64.0, 65.0, 66.0]})
    assert s["mlp_acc"].startswith("65.00 ±")
    sp = write_performance_summary(
        str(tmp_path / "summary.txt"), "test_model",
        {"knn_acc": [60.0, 61.0]}, extra_lines=["gates: 0.5"])
    text = open(sp).read()
    assert "test_model" in text and "knn_acc" in text and "gates" in text
