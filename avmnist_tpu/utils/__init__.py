from avmnist_tpu.utils.reproducibility import set_seed  # noqa: F401
