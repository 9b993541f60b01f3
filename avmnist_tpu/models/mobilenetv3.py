"""MobileNetV3-Small backbone in flax.

The reference wraps torchvision ``mobilenet_v3_small`` with a 1-channel stem and
classifier=Identity (dino.py:158-178, "MobileVitEncoder" — misnamed, it's a MobileNet).
This is a faithful re-implementation of that topology (inverted residual bottlenecks
with squeeze-excite, hard-swish) returning pooled 576-d features.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
from flax import linen as nn

from avmnist_tpu.models.layers import Conv, Dense, global_avg_pool


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


class BlockSpec(NamedTuple):
    kernel: int
    expand: int
    out: int
    se: bool
    hs: bool  # hard-swish (else relu)
    stride: int


# torchvision mobilenet_v3_small inverted-residual configuration.
SMALL_SPEC: Sequence[BlockSpec] = (
    BlockSpec(3, 16, 16, True, False, 2),
    BlockSpec(3, 72, 24, False, False, 2),
    BlockSpec(3, 88, 24, False, False, 1),
    BlockSpec(5, 96, 40, True, True, 2),
    BlockSpec(5, 240, 40, True, True, 1),
    BlockSpec(5, 240, 40, True, True, 1),
    BlockSpec(5, 120, 48, True, True, 1),
    BlockSpec(5, 144, 48, True, True, 1),
    BlockSpec(5, 288, 96, True, True, 2),
    BlockSpec(5, 576, 96, True, True, 1),
    BlockSpec(5, 576, 96, True, True, 1),
)


class SqueezeExcite(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        squeeze = _make_divisible(self.channels // 4)
        s = Conv(squeeze, (1, 1))(s)
        s = nn.relu(s)
        s = Conv(self.channels, (1, 1))(s)
        return x * hard_sigmoid(s)


class InvertedResidual(nn.Module):
    spec: BlockSpec

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9)
        act = hard_swish if self.spec.hs else nn.relu
        inp = x.shape[-1]
        y = x
        if self.spec.expand != inp:
            y = Conv(self.spec.expand, (1, 1), use_bias=False)(y)
            y = act(bn()(y))
        k, s = self.spec.kernel, self.spec.stride
        y = Conv(self.spec.expand, (k, k), strides=(s, s), padding=k // 2,
                 feature_group_count=self.spec.expand, use_bias=False)(y)
        y = act(bn()(y))
        if self.spec.se:
            y = SqueezeExcite(self.spec.expand)(y)
        y = Conv(self.spec.out, (1, 1), use_bias=False)(y)
        y = bn()(y)
        if s == 1 and inp == self.spec.out:
            y = x + y
        return y


class MobileNetV3Small(nn.Module):
    """Feature extractor: (B, H, W, 1) -> (B, 576)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9)
        # 1-channel stem (reference swaps features[0][0] for grayscale input).
        x = Conv(16, (3, 3), strides=(2, 2), padding=1, use_bias=False)(x)
        x = hard_swish(bn()(x))
        for spec in SMALL_SPEC:
            x = InvertedResidual(spec)(x, train=train)
        x = Conv(576, (1, 1), use_bias=False)(x)
        x = hard_swish(bn()(x))
        return global_avg_pool(x)
