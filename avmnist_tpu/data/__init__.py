from avmnist_tpu.data.memmap import AVMNISTArrays, avmnist_paths, load_avmnist  # noqa: F401
from avmnist_tpu.data.datasets import (  # noqa: F401
    DataSplit,
    Batches,
    host_shard,
    split_train_val,
    prefetch_to_device,
)
from avmnist_tpu.data.synthetic import make_synthetic_avmnist  # noqa: F401
