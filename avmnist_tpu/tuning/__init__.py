from avmnist_tpu.tuning.search import (  # noqa: F401
    run_study,
    search_hyperparameters,
    search_augmentation_hyperparameters,
)
from avmnist_tpu.tuning.spaces import (  # noqa: F401
    FallbackTrial,
    process_augment_config,
    suggest_hyperparameters,
)
