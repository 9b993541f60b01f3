from avmnist_tpu.augment.multicrop import MultiCropAugment, make_views  # noqa: F401
from avmnist_tpu.augment.simclr import SimCLRAugment  # noqa: F401
