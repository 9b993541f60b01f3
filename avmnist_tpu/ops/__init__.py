from avmnist_tpu.ops.pallas_specgram import psd_specgram_pallas  # noqa: F401
from avmnist_tpu.ops.pallas_ntxent import nt_xent_logits_pallas  # noqa: F401
from avmnist_tpu.ops.pallas_fused import (  # noqa: F401
    bn_relu_pool,
    bn_relu_pool_reference,
    fused_enabled,
)
