from avmnist_tpu.eval.probes import (  # noqa: F401
    extract_features,
    train_linear_probe,
    knn_probe,
)
from avmnist_tpu.eval.metrics import compute_classification_metrics  # noqa: F401
