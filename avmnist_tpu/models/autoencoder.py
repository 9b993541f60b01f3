"""Audio (masked) conv autoencoders (reference other_ssl/autoencoder/autoencoder.ipynb
cells 4, 5, 7, 8).

Masking is done OUTSIDE the model here (a pure vmapped function in
``avmnist_tpu.augment.functional.grouped_mask_batch``) and the masked input / mask are
passed in — keeping the module pure under jit. Loss semantics preserved from the
reference training loop (cell 12): ``mse(recon * mask, x * mask)`` where the binary
mask is 0 at MASKED groups — i.e. the loss is actually measured on the *visible*
region (the reference's comment says "masked regions" but the code does the opposite;
we keep the code's behavior for parity and expose ``loss_on="visible"|"masked"``
in the objective for the corrected variant).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from avmnist_tpu.models.layers import Conv, Dense
from avmnist_tpu.models.mobilenetv3 import MobileNetV3Small


class ConvDecoder(nn.Module):
    """latent -> 256*7*7 -> 4x ConvTranspose(k3,s2) -> sigmoid, (B,112,112,1)
    (autoencoder.ipynb cell 4 decoder)."""

    @nn.compact
    def __call__(self, z):
        x = nn.relu(Dense(256 * 7 * 7)(z))
        x = x.reshape(x.shape[0], 7, 7, 256)
        for w in (128, 64, 32):
            x = nn.relu(nn.ConvTranspose(w, (3, 3), strides=(2, 2), padding="SAME")(x))
        x = nn.ConvTranspose(1, (3, 3), strides=(2, 2), padding="SAME")(x)
        return nn.sigmoid(x)


class ConvAutoencoder(nn.Module):
    """4x stride-2 conv encoder to latent ``output_dim`` + transpose decoder
    (autoencoder.ipynb cell 4; 13.63M params)."""

    output_dim: int = 256
    dropout: float = 0.2  # cell 4 applies Dropout(0.2) after the first two conv blocks

    @nn.compact
    def __call__(self, spectrograms, train: bool = True):
        x = spectrograms
        for i, w in enumerate((32, 64, 128, 256)):
            x = nn.relu(Conv(w, (3, 3), strides=(2, 2), padding=1)(x))
            if i < 2 and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        latent = Dense(self.output_dim)(x.reshape(x.shape[0], -1))
        recon = ConvDecoder()(latent)
        return recon, latent

    def encode(self, spectrograms, train: bool = True):
        x = spectrograms
        for i, w in enumerate((32, 64, 128, 256)):
            x = nn.relu(Conv(w, (3, 3), strides=(2, 2), padding=1)(x))
            if i < 2 and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return Dense(self.output_dim)(x.reshape(x.shape[0], -1))


class MaskedConvAutoencoder(nn.Module):
    """Same topology without encoder dropout (cell 7; 7.21M params). The caller masks
    the input with ``grouped_mask_batch(mask_ratio=0.75)`` before encoding."""

    output_dim: int = 256

    @nn.compact
    def __call__(self, masked_spectrograms, train: bool = True):
        x = masked_spectrograms
        for w in (32, 64, 128, 256):
            x = nn.relu(Conv(w, (3, 3), strides=(2, 2), padding=1)(x))
        latent = Dense(self.output_dim)(x.reshape(x.shape[0], -1))
        recon = ConvDecoder()(latent)
        return recon, latent


class MobileVitMaskedAutoencoder(nn.Module):
    """MobileNetV3-small encoder + conv-transpose decoder (cell 8)."""

    output_dim: int = 256

    @nn.compact
    def __call__(self, masked_spectrograms, train: bool = True):
        x = MobileNetV3Small()(masked_spectrograms, train=train)
        x = nn.relu(Dense(256)(x))
        latent = Dense(self.output_dim)(x)
        recon = ConvDecoder()(latent)
        return recon, latent
