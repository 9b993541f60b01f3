"""The encoder zoo: 9 multimodal + 7 unimodal encoders (reference models/dino.py:16-583).

Conventions (TPU-first, not a torch translation):
- NHWC everywhere: images (B, 28, 28, 1), spectrograms (B, 112, 112, 1).
- Multimodal signature: ``__call__(images, spectrograms, train)``; they also expose
  ``encode_image`` / ``encode_audio`` methods (apply with ``method=``) because the DINO
  hybrid objectives tap per-modality features (dino.py:977-978, 1065-1066).
- Unimodal signature:   ``__call__(images=None, spectrograms=None, train=True)`` with a
  class-level ``modality`` attribute — mirroring the reference dispatch
  (dino.py:473-583) so DINO/probe code is shared across both families.
- Multi-crop views are folded into the batch axis by callers; encoders never loop.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from avmnist_tpu.models.layers import (
    BiLSTM,
    Conv,
    ConvBNRelu,
    Dense,
    global_avg_pool,
)
from avmnist_tpu.models.lenet import CentralUnimodalAudio, CentralUnimodalImage
from avmnist_tpu.models.mobilenetv3 import MobileNetV3Small
from avmnist_tpu.models.resnet import ResNet18
from avmnist_tpu.models.vit import ViTEncoder

# ------------------------------ partial encoders ------------------------------


class ImageConvEncoder(nn.Module):
    """3x(Conv-BN-ReLU-MaxPool) 32->64->128 + GAP + Linear (dino.py:18-42)."""

    output_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = True):
        for w in (32, 64, 128):
            x = ConvBNRelu(w)(x, train=train)
        return Dense(self.output_dim)(global_avg_pool(x))


class AudioConvEncoder(nn.Module):
    """4x(Conv-BN-ReLU-MaxPool) 32->...->256 + GAP + Linear (dino.py:44-73)."""

    output_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = True):
        for w in (32, 64, 128, 256):
            x = ConvBNRelu(w)(x, train=train)
        return Dense(self.output_dim)(global_avg_pool(x))


class LSTMSpatialEncoder(nn.Module):
    """CNN -> project to 64 -> BiLSTM over spatial tokens -> mean-pool
    (dino.py:75-156; 2 pools for image -> 49 tokens, 3 for audio -> 196)."""

    output_dim: int = 256
    proj_dim: int = 64
    n_pools: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, w in enumerate((32, 64, 128)):
            x = ConvBNRelu(w, pool=(i < self.n_pools))(x, train=train)
        b, h, w_, c = x.shape
        x = x.reshape(b, h * w_, c)
        x = nn.relu(Dense(self.proj_dim)(x))
        x = BiLSTM(self.output_dim // 2)(x)
        return jnp.mean(x, axis=1)


class MobileVitEncoder(nn.Module):
    """MobileNetV3-small + 576->256->output head (dino.py:158-178; name kept from the
    reference even though the backbone is a MobileNet, not a ViT)."""

    output_dim: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = MobileNetV3Small()(x, train=train)
        x = nn.relu(Dense(256)(x))
        return Dense(self.output_dim)(x)


class ResNetEncoder(nn.Module):
    """ResNet18 + 512->256->output head (dino.py:180-199)."""

    output_dim: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ResNet18()(x, train=train)
        x = nn.relu(Dense(256)(x))
        return Dense(self.output_dim)(x)


class CentralImageTrunk(nn.Module):
    """CentralUnimodalImage + Linear(64*5*5 -> E) (dino.py:459-462)."""

    output_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = True):
        return Dense(self.output_dim)(CentralUnimodalImage()(x, train=train))


class CentralAudioTrunk(nn.Module):
    """CentralUnimodalAudio + Linear(64*7*7 -> E) (dino.py:464-468)."""

    output_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = True):
        return Dense(self.output_dim)(CentralUnimodalAudio()(x, train=train))


# ------------------------------ multimodal encoders ------------------------------


class FusionMLP(nn.Module):
    """concat -> Linear(2E->E) -> ReLU -> Dropout -> Linear(E->out) (dino.py:222-227)."""

    output_dim: int
    encoder_output_dim: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, img_f, aud_f, train: bool = True):
        x = jnp.concatenate([img_f, aud_f], axis=1)
        x = nn.relu(Dense(self.encoder_output_dim)(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return Dense(self.output_dim)(x)


class SimpleMultiModalEncoder(nn.Module):
    """Concat fusion of conv encoders (dino.py:214-234). Base of the multimodal family;
    subclasses override ``make_encoders`` / ``make_fusion`` / ``fuse``."""

    output_dim: int = 256
    encoder_output_dim: int = 512
    fusion_dropout: float = 0.3
    modality: Optional[str] = None  # None marks multimodal

    def make_encoders(self):
        return (
            ImageConvEncoder(self.encoder_output_dim),
            AudioConvEncoder(self.encoder_output_dim),
        )

    def make_fusion(self):
        return FusionMLP(self.output_dim, self.encoder_output_dim, self.fusion_dropout)

    def setup(self):
        self.image_encoder, self.audio_encoder = self.make_encoders()
        self.fusion = self.make_fusion()
        self.extras()

    def extras(self):
        """Hook for subclasses to declare additional params/submodules."""

    def encode_image(self, images, train: bool = True):
        return self.image_encoder(images, train=train)

    def encode_audio(self, spectrograms, train: bool = True):
        return self.audio_encoder(spectrograms, train=train)

    def fuse(self, f_i, f_a, train: bool = True):
        return self.fusion(f_i, f_a, train=train)

    def __call__(self, images, spectrograms, train: bool = True):
        return self.fuse(
            self.encode_image(images, train=train),
            self.encode_audio(spectrograms, train=train),
            train=train,
        )


class GatedMultiModalEncoder(SimpleMultiModalEncoder):
    """+ learnable scalar sigmoid gates, init 0.5 (dino.py:237-259)."""

    def extras(self):
        self.gate_image = self.param("gate_image", nn.initializers.constant(0.5), ())
        self.gate_audio = self.param("gate_audio", nn.initializers.constant(0.5), ())

    def fuse(self, f_i, f_a, train: bool = True):
        return self.fusion(
            nn.sigmoid(self.gate_image) * f_i,
            nn.sigmoid(self.gate_audio) * f_a,
            train=train,
        )


class LSTMMultiModalEncoder(SimpleMultiModalEncoder):
    """Swaps in the CNN+BiLSTM encoders (dino.py:262-270)."""

    def make_encoders(self):
        return (
            LSTMSpatialEncoder(self.encoder_output_dim, n_pools=2),
            LSTMSpatialEncoder(self.encoder_output_dim, n_pools=3),
        )


class ViTMultiModalEncoder(SimpleMultiModalEncoder):
    """Conv image encoder + audio ViT(patch 8, depth 4, heads 4) (dino.py:273-285)."""

    def make_encoders(self):
        return (
            ImageConvEncoder(self.encoder_output_dim),
            ViTEncoder(patch_size=8, embed_dim=self.encoder_output_dim, depth=4,
                       num_heads=4),
        )


class DualViTFusion(nn.Module):
    """2E -> 512 -> out, no dropout (dino.py:340-344)."""

    output_dim: int

    @nn.compact
    def __call__(self, f_i, f_a, train: bool = True):
        x = jnp.concatenate([f_i, f_a], axis=1)
        return Dense(self.output_dim)(nn.relu(Dense(512)(x)))


class DualViTMultiModalEncoder(GatedMultiModalEncoder):
    """ViT both modalities; heads = max(1, E//64) (dino.py:288-344). The reference's
    own ``forward`` (dino.py:346-360) is commented out, so the INHERITED
    ``GatedMultiModalEncoder.forward`` runs: sigmoid-gated features, concatenated,
    through the DualViT 2E->512->out fusion (dino.py:246-260) — preserved here by
    using the inherited gated ``fuse`` with this class's fusion head."""

    image_patch_size: int = 4
    audio_patch_size: int = 8
    depth: int = 4
    vit_dropout: float = 0.1

    def make_encoders(self):
        heads = max(1, self.encoder_output_dim // 64)
        return (
            ViTEncoder(patch_size=self.image_patch_size, embed_dim=self.encoder_output_dim,
                       depth=self.depth, num_heads=heads, dropout=self.vit_dropout),
            ViTEncoder(patch_size=self.audio_patch_size, embed_dim=self.encoder_output_dim,
                       depth=self.depth, num_heads=heads, dropout=self.vit_dropout),
        )

    def make_fusion(self):
        return DualViTFusion(self.output_dim)


class MobileViTMultiModalEncoder(SimpleMultiModalEncoder):
    """MobileNetV3 both modalities (dino.py:362-371)."""

    def make_encoders(self):
        return (
            MobileVitEncoder(self.encoder_output_dim),
            MobileVitEncoder(self.encoder_output_dim),
        )


class ResNetMultiModalEncoder(GatedMultiModalEncoder):
    """ResNet18 both modalities, gated (dino.py:373-382)."""

    def make_encoders(self):
        return (
            ResNetEncoder(self.encoder_output_dim),
            ResNetEncoder(self.encoder_output_dim),
        )


class CrossModalAttention(nn.Module):
    """Single-head attention across the BATCH dimension with residual
    (dino.py:385-404 — the B x B attention-over-batch is a reference quirk, preserved)."""

    @nn.compact
    def __call__(self, x1, x2):
        d = x1.shape[-1]
        q = Dense(d, name="q_proj")(x1)
        kv = Dense(2 * d, name="kv_proj")(x2)
        k, v = jnp.split(kv, 2, axis=-1)
        attn = nn.softmax((q @ k.T) * (d ** -0.5), axis=-1)  # (B, B)
        return x1 + attn @ v


class CrossAttentionMultiModalEncoder(SimpleMultiModalEncoder):
    """Bidirectional cross-attention + concat + fusion (dino.py:407-452)."""

    def extras(self):
        self.image_to_audio_attention = CrossModalAttention()
        self.audio_to_image_attention = CrossModalAttention()

    def __call__(self, images, spectrograms, train: bool = True):
        f_i = self.encode_image(images, train=train)
        f_a = self.encode_audio(spectrograms, train=train)
        i2a = self.image_to_audio_attention(f_i, f_a)
        a2i = self.audio_to_image_attention(f_a, f_i)
        return self.fusion(i2a, a2i, train=train)


class CentralMultiModalEncoder(SimpleMultiModalEncoder):
    """CentralNet LeNet trunks + Linear projections (dino.py:454-468) — the reference's
    best multimodal DINO model ("multi_central")."""

    def make_encoders(self):
        return (
            CentralImageTrunk(self.encoder_output_dim),
            CentralAudioTrunk(self.encoder_output_dim),
        )


# ------------------------------ unimodal encoders ------------------------------


class UniModalEncoder(nn.Module):
    """Base for unimodal encoders (dino.py:473-480)."""

    output_dim: int = 256
    modality: str = "image"

    def pick(self, images, spectrograms):
        x = images if self.modality == "image" else spectrograms
        if x is None:
            raise ValueError(f"{type(self).__name__} requires {self.modality} input")
        return x


class ImageEncoder(UniModalEncoder):
    """Conv encoder(512) + Linear projection (dino.py:483-499)."""

    modality: str = "image"

    @nn.compact
    def __call__(self, images=None, spectrograms=None, train: bool = True):
        x = ImageConvEncoder(512, name="encoder")(self.pick(images, spectrograms), train=train)
        return Dense(self.output_dim, name="projection")(x)


class SpectrogramEncoder(UniModalEncoder):
    """Audio conv encoder straight to output_dim (dino.py:502-513)."""

    modality: str = "audio"

    @nn.compact
    def __call__(self, images=None, spectrograms=None, train: bool = True):
        return AudioConvEncoder(self.output_dim, name="encoder")(
            self.pick(images, spectrograms), train=train
        )


class SpectrogramEncoderCentral(UniModalEncoder):
    """CentralUnimodalAudio + Linear(3136->out) (dino.py:515-523)."""

    modality: str = "audio"

    @nn.compact
    def __call__(self, images=None, spectrograms=None, train: bool = True):
        x = CentralUnimodalAudio()(self.pick(images, spectrograms), train=train)
        return Dense(self.output_dim)(x)


class SpectrogramEncoderLSTM(UniModalEncoder):
    """CNN+BiLSTM audio encoder (dino.py:525-530)."""

    modality: str = "audio"

    @nn.compact
    def __call__(self, images=None, spectrograms=None, train: bool = True):
        return LSTMSpatialEncoder(self.output_dim, n_pools=3)(
            self.pick(images, spectrograms), train=train
        )


class SpectrogramEncoderViT(UniModalEncoder):
    """AudioViT(512, depth 4, heads 4) + Linear (dino.py:532-546)."""

    modality: str = "audio"

    @nn.compact
    def __call__(self, images=None, spectrograms=None, train: bool = True):
        x = ViTEncoder(patch_size=8, embed_dim=512, depth=4, num_heads=4)(
            self.pick(images, spectrograms), train=train
        )
        return Dense(self.output_dim)(x)


class SpectrogramEncoderMobileViT(UniModalEncoder):
    """MobileNetV3 + 576->256->out (dino.py:548-565; default output_dim=128)."""

    output_dim: int = 128
    modality: str = "audio"

    @nn.compact
    def __call__(self, images=None, spectrograms=None, train: bool = True):
        x = MobileNetV3Small()(self.pick(images, spectrograms), train=train)
        x = nn.relu(Dense(256)(x))
        return Dense(self.output_dim)(x)


class SpectrogramEncoderResNet(UniModalEncoder):
    """ResNet18 + 512->256->out (dino.py:567-583)."""

    modality: str = "audio"

    @nn.compact
    def __call__(self, images=None, spectrograms=None, train: bool = True):
        x = ResNet18()(self.pick(images, spectrograms), train=train)
        x = nn.relu(Dense(256)(x))
        return Dense(self.output_dim)(x)
