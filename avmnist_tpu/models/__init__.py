from avmnist_tpu.models.registry import MODEL_MAP, UNIMODAL_MODEL_MAP, build_encoder  # noqa: F401
