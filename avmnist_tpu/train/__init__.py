from avmnist_tpu.train.state import TrainState  # noqa: F401
from avmnist_tpu.train.optim import torch_adam, torch_adamw, cosine_epoch_schedule  # noqa: F401
