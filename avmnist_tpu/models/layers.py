"""Shared building blocks for the encoder zoo (flax.linen, NHWC).

Initialization parity: torch's Conv2d/Linear default is kaiming_uniform(a=sqrt(5)),
which equals ``variance_scaling(1/3, fan_in, uniform)``; CentralNet's explicit
``kaiming_uniform_`` (a=0) equals ``variance_scaling(2, fan_in, uniform)``
(reference centralnet.py:37-40). Biases are zero-init here (torch uses
uniform(±1/sqrt(fan_in)); the difference is immaterial for training dynamics and is
documented as a deliberate deviation).

BatchNorm: flax momentum 0.9 == torch momentum 0.1 (running = 0.9*old + 0.1*new),
eps 1e-5. ``train=True`` uses batch statistics and updates the ``batch_stats``
collection — matching torch train mode, including for the frozen DINO teacher, whose
modules stay in train mode in the reference (SURVEY.md §7 hard-part 4).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Conv2d / nn.Linear default kernel init.
torch_default_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# torch nn.init.kaiming_uniform_(w) with default a=0 (CentralNet's explicit init).
kaiming_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


class Dense(nn.Dense):
    """nn.Dense with torch-default kernel init."""

    kernel_init: Callable = torch_default_init


class Conv(nn.Conv):
    """nn.Conv with torch-default kernel init."""

    kernel_init: Callable = torch_default_init


def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """torch F.max_pool2d(x, 2): window 2, stride 2, floor division of odd dims.
    (nn.max_pool / reduce-window; a reshape+reduce-max variant benchmarked SLOWER in
    the backward on TPU — 91ms vs 70ms SimCLR step at B=1024.)"""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) + flatten: (B, H, W, C) -> (B, C)."""
    return jnp.mean(x, axis=(1, 2))


class _FusedBNReluPool(nn.Module):
    """BatchNorm(train) + ReLU + MaxPool2 through ``ops.pallas_fused.bn_relu_pool``.

    Param/variable names ('scale'/'bias', 'mean'/'var') and the running-stat update
    rule match ``flax.linen.BatchNorm`` exactly, and the module is instantiated with
    ``name='BatchNorm_0'`` so the parameter tree — and therefore every checkpoint —
    is byte-identical to the unfused path."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        from avmnist_tpu.ops.pallas_fused import bn_relu_pool

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        out, mean, var = bn_relu_pool(x, scale, bias, self.epsilon)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value.astype(jnp.float32) + (1 - m) * mean
            ra_var.value = m * ra_var.value.astype(jnp.float32) + (1 - m) * var
        return out


class ConvBNRelu(nn.Module):
    """Conv -> BatchNorm -> ReLU (-> optional MaxPool2), the reference's basic block
    (e.g. dino.py:18-73).

    ``use_bias`` defaults to False: a conv bias feeding BatchNorm is mathematically
    inert — BN's mean subtraction cancels it in train mode AND through the running
    stats at eval, and its gradient is identically zero (d/db[(y+b)-mean(y+b)] = 0).
    The reference's nn.Conv2d keeps the (random-init, never-moving) bias and pays
    for it; on TPU the dL/db reductions alone cost ~5.2 ms/step at B=1024 on the
    112x112 audio stem (measured via hlo_stats, round 2). Exact in function space.

    On a TPU backend the train-mode BN+ReLU+pool epilogue CAN run as one fused
    Pallas kernel pair (ops/pallas_fused.py) when ``AVMNIST_PALLAS_FUSED=1`` —
    same math, ~1/4 the HBM traffic in-kernel, but default OFF: the per-call
    relay dispatch cost made it a net loss in the round-2 A/B
    (docs/PERF_NOTES.md). The parameter tree is identical either way, so the
    paths are checkpoint-interchangeable."""

    features: int
    kernel: int = 3
    padding: Any = "SAME"
    pool: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        from avmnist_tpu.ops.pallas_fused import fused_enabled

        x = Conv(self.features, (self.kernel, self.kernel), padding=self.padding,
                 use_bias=self.use_bias)(x)
        if (self.pool and train and not self.is_initializing() and fused_enabled()
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            return _FusedBNReluPool(name="BatchNorm_0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        if self.pool:
            x = max_pool2(x)
        return x


class MLPHead(nn.Module):
    """Linear -> ReLU -> Linear (downstream classifier head, dino.py:1782-1786)."""

    hidden_dim: int = 128
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        x = Dense(self.hidden_dim)(x)
        x = nn.relu(x)
        return Dense(self.num_classes)(x)


class ProjectionHead(nn.Module):
    """Linear -> BatchNorm1d -> GELU -> Dropout -> Linear (dino.py:1240-1254)."""

    projection_dim: int = 256
    hidden_dim: int = 512
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Dense(self.hidden_dim)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default: exact erf
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return Dense(self.projection_dim)(x)


class BiLSTM(nn.Module):
    """Bidirectional LSTM over (B, T, F); returns (B, T, 2*hidden) like torch
    nn.LSTM(bidirectional=True, batch_first=True)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), time_major=False)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), time_major=False, reverse=True,
                     keep_order=True)
        return nn.Bidirectional(fwd, bwd, time_major=False)(x)
