"""SimCLR two-view augmentation bank (reference SimCLRMultiModalAugmentation,
get_data.py:299-408), on device."""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from avmnist_tpu.augment.multicrop import OpSpec, apply_chain, chain_from_config, op

# get_data.py:313-339
SIMCLR_IMAGE: Tuple[OpSpec, ...] = (
    op("random_resized_crop", scale=(0.5, 1.0), ratio=(0.8, 1.2)),
    op("random_rotation", degrees=5.0),
    op("random_affine", translate=(0.1, 0.1)),
    op("elastic", p=0.3, alpha=20.0, sigma=3.0),
    op("gaussian_blur", p=0.3, sigma=(0.1, 0.5)),
)
# get_data.py:342-369
SIMCLR_AUDIO: Tuple[OpSpec, ...] = (
    op("random_resized_crop", scale=(0.5, 1.0)),
    op("time_warp", p=0.5, min_factor=0.9, max_factor=1.1),
    op("frequency_mask", p=0.5, freq_mask_param=10),
    op("time_mask", p=0.5, time_mask_param=10),
    op("gaussian_noise", p=0.3, std=0.05),
)


@dataclasses.dataclass
class SimCLRAugment:
    """__call__ returns (img_v1, aud_v1, img_v2, aud_v2), each (B, H, W, 1) — the
    reference's view tuple order (get_data.py:392-408)."""

    image_ops: Tuple[OpSpec, ...] = SIMCLR_IMAGE
    audio_ops: Tuple[OpSpec, ...] = SIMCLR_AUDIO

    @classmethod
    def from_config(cls, best_augments: Optional[Dict] = None) -> "SimCLRAugment":
        if not best_augments:
            return cls()
        aug = dict(best_augments["augmentations"])
        probs = best_augments.get("augmentation_probabilities")
        if probs:
            aug = {k: {**v, "p": probs[k]} for k, v in aug.items()}
        return cls(audio_ops=tuple(chain_from_config(aug)))

    def __call__(self, images, audios, key):
        images = images.reshape(images.shape[0], 28, 28)
        audios = audios.reshape(audios.shape[0], 112, 112)
        b = images.shape[0]

        def two_views(ops, x, k):
            out = apply_chain(ops, jnp.tile(x, (2, 1, 1)), k)
            return out[:b][..., None], out[b:][..., None]

        k_img, k_aud = jax.random.split(key)
        i1, i2 = two_views(self.image_ops, images, k_img)
        a1, a2 = two_views(self.audio_ops, audios, k_aud)
        return i1, a1, i2, a2
