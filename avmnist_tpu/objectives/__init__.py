from avmnist_tpu.objectives.common import Objective, normalize_images, normalize_audio  # noqa: F401
