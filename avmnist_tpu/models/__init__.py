from avmnist_tpu.models.registry import MODEL_MAP, UNIMODAL_MODEL_MAP, build_encoder  # noqa: F401
from avmnist_tpu.models import mfas  # noqa: F401  (MFAS NAS cells, aux_models.py:151-539)
