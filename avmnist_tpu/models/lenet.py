"""LeNet-style unimodal nets (reference models/unimodal.py:105-221).

``with_head=False`` (the default, as used by CentralMultiModalEncoder and the
supervised benchmarks' feature taps) returns the flattened conv features:
image -> 64*5*5 = 1600, audio -> 64*7*7 = 3136.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from avmnist_tpu.models.layers import Conv, Dense, max_pool2


class CentralUnimodalImage(nn.Module):
    """2-conv LeNet on 28x28 (unimodal.py:105-153). 28->14 (k5 pad2) ->10->5 (k5 pad0)."""

    with_head: bool = False
    dropout_prob: float = 0.5
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9)
        x = Conv(32, (5, 5), padding=2, use_bias=False)(x)  # bias inert before BN
        x = max_pool2(nn.relu(bn()(x)))          # (B,14,14,32)
        x = Conv(64, (5, 5), padding=0, use_bias=False)(x)
        x = max_pool2(nn.relu(bn()(x)))          # (B,5,5,64)
        x = x.reshape(x.shape[0], -1)            # 1600
        if self.with_head:
            x = nn.relu(Dense(1024)(x))
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
            x = Dense(self.num_classes)(x)
        return x


class CentralUnimodalAudio(nn.Module):
    """4-conv LeNet on 112x112 (unimodal.py:155-221). 112->56->28->14->7."""

    with_head: bool = False
    dropout_prob: float = 0.5
    num_classes: int = 10
    widths: Sequence[int] = (8, 16, 32, 64)

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9)
        for w in self.widths:
            x = Conv(w, (5, 5), padding=2, use_bias=False)(x)  # bias inert before BN
            x = max_pool2(nn.relu(bn()(x)))
        x = x.reshape(x.shape[0], -1)             # 64*7*7 = 3136
        if self.with_head:
            x = nn.relu(Dense(1024)(x))
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
            x = Dense(self.num_classes)(x)
        return x
