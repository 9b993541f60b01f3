"""Model registry: the exact CLI names from the reference (run_dino.py:530-550)."""
from __future__ import annotations

from typing import Any, Dict, Optional

from avmnist_tpu.models import encoders as E

MODEL_MAP: Dict[str, type] = {
    "multi_simple": E.SimpleMultiModalEncoder,
    "multi_simple_gated": E.GatedMultiModalEncoder,
    "multi_lstm": E.LSTMMultiModalEncoder,
    "multi_vit": E.ViTMultiModalEncoder,
    "multi_dual_vit": E.DualViTMultiModalEncoder,
    "multi_mobile_vit": E.MobileViTMultiModalEncoder,
    "multi_resnet": E.ResNetMultiModalEncoder,
    "multi_cross_attention": E.CrossAttentionMultiModalEncoder,
    "multi_central": E.CentralMultiModalEncoder,
}

UNIMODAL_MODEL_MAP: Dict[str, type] = {
    "image_simple": E.ImageEncoder,
    "spectrogram_simple": E.SpectrogramEncoder,
    "spectrogram_central": E.SpectrogramEncoderCentral,
    "spectrogram_lstm": E.SpectrogramEncoderLSTM,
    "spectrogram_resnet": E.SpectrogramEncoderResNet,
    "spectrogram_vit": E.SpectrogramEncoderViT,
    "spectrogram_mobile_vit": E.SpectrogramEncoderMobileViT,
}


def build_encoder(name: str, output_dim: int = 256,
                  encoder_output_dim: Optional[int] = None, **kwargs: Any):
    """Instantiate an encoder by CLI name. Multimodal encoders accept
    encoder_output_dim (pre-fusion width); unimodal ones only output_dim."""
    if name in MODEL_MAP:
        cls = MODEL_MAP[name]
        return cls(output_dim=output_dim,
                   encoder_output_dim=encoder_output_dim or 512, **kwargs)
    if name in UNIMODAL_MODEL_MAP:
        cls = UNIMODAL_MODEL_MAP[name]
        return cls(output_dim=output_dim, **kwargs)
    raise KeyError(
        f"Unknown model '{name}'. Multimodal: {sorted(MODEL_MAP)}; "
        f"unimodal: {sorted(UNIMODAL_MODEL_MAP)}"
    )


def is_unimodal(name: str) -> bool:
    return name in UNIMODAL_MODEL_MAP
