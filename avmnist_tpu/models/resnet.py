"""ResNet-18 backbone (reference uses torchvision resnet18 with a 1-channel conv1 and
fc=Identity, dino.py:180-199) rebuilt in flax. Returns pooled 512-d features."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from avmnist_tpu.models.layers import Conv, global_avg_pool


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9)
        y = Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                 padding=1, use_bias=False)(x)
        y = bn()(y)
        y = nn.relu(y)
        y = Conv(self.features, (3, 3), padding=1, use_bias=False)(y)
        y = bn()(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                     use_bias=False)(x)
            x = bn()(x)
        return nn.relu(x + y)


class ResNet18(nn.Module):
    """Feature extractor: (B, H, W, 1) -> (B, 512)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = True):
        # 1-channel 7x7 stride-2 stem (reference re-makes conv1 for grayscale).
        x = Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (n, w) in enumerate(zip(self.stage_sizes, self.widths)):
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                x = BasicBlock(w, stride)(x, train=train)
        return global_avg_pool(x)
