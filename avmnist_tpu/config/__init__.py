from avmnist_tpu.config.schema import (  # noqa: F401
    load_config,
    save_config,
    default_config,
    setup_jax,
    update_hardware_config,
)
