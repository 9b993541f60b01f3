"""MiniResNet: hand-rolled 112x112 ResNet with zero-pad option-A shortcuts
(reference models/mini_resnet.py:63-136; unused by the live drivers but part of the
model inventory). Returns pooled 512-d features."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from avmnist_tpu.models.layers import Conv, global_avg_pool, max_pool2


class CnnBlock(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(self.features, (self.kernel, self.kernel),
                 strides=(self.stride, self.stride), padding=self.padding,
                 use_bias=False)(x)  # bias inert before BN
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


class ResidualBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = CnnBlock(self.features, padding=1)(x, train=train)
        y = CnnBlock(self.features, padding=1)(y, train=train)
        return x + y


def zero_pad_shortcut(x, out_channels: int, stride: int = 2):
    """Option-A shortcut: strided subsample + zero-pad new channels
    (mini_resnet.py:36-61)."""
    x = x[:, ::stride, ::stride, :]
    pad = out_channels - x.shape[-1]
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
    return x


class MiniResNet(nn.Module):
    """(B, 112, 112, 1) -> (B, 512)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = CnnBlock(64, kernel=7, stride=2, padding=3)(x, train=train)  # 56
        x = max_pool2(x)                                                  # 28
        x = ResidualBlock(64)(x, train=train)
        res = zero_pad_shortcut(x, 128)
        x = max_pool2(CnnBlock(128, padding=1)(x, train=train)) + res     # 14
        x = ResidualBlock(128)(x, train=train)
        res = zero_pad_shortcut(x, 256)
        x = max_pool2(CnnBlock(256, padding=1)(x, train=train)) + res     # 7
        x = ResidualBlock(256)(x, train=train)
        res = zero_pad_shortcut(x, 512)                                   # 4x4
        y = CnnBlock(512, padding=1)(x, train=train)                      # 7x7
        y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))                  # 8x8 (ref pads right/bottom)
        x = max_pool2(y) + res                                            # 4x4
        return global_avg_pool(x)
