"""CentralNet auxiliary ops (reference models/centralnet/aux_models.py).

The live CentralNet path uses only GlobalPooling2D (SURVEY.md §2b); the remaining ops
below (padding helpers, Maxout, alpha-blending) are provided for component parity.
The MFAS neural-architecture-search machinery (Cell/FixedCell/CellBlock/CreateOp/
DropPath/FactorizedReduction/ConvBranch/PoolBranch/SeparableConv/AuxiliaryHead,
aux_models.py:151-539) lives in models/mfas.py — dead code in the reference (never
imported by any live or archived driver) but re-implemented for full component
parity.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from avmnist_tpu.models.layers import Conv, Dense


def global_pooling_2d(x: jnp.ndarray) -> jnp.ndarray:
    """GlobalPooling2D (aux_models.py:53): spatial mean, (B, H, W, C) -> (B, C)."""
    return jnp.mean(x, axis=(1, 2))


def pad_features(f: jnp.ndarray, target_width: int) -> jnp.ndarray:
    """Right zero-padding of the feature dim (aux_models.py:21-50 padding ops)."""
    pad = target_width - f.shape[-1]
    if pad <= 0:
        return f
    return jnp.pad(f, [(0, 0)] * (f.ndim - 1) + [(0, pad)])


class Maxout(nn.Module):
    """Maxout layer (aux_models.py:77): k linear pieces, elementwise max."""

    features: int
    k: int = 2

    @nn.compact
    def __call__(self, x):
        y = Dense(self.features * self.k)(x)
        y = y.reshape(*x.shape[:-1], self.k, self.features)
        return jnp.max(y, axis=-2)


def alpha_blend(f1: jnp.ndarray, f2: jnp.ndarray, alpha1, alpha2) -> jnp.ndarray:
    """Learned-alpha weighted blend with width matching (aux_models.py:93-124)."""
    width = max(f1.shape[-1], f2.shape[-1])
    return pad_features(f1, width) * alpha1 + pad_features(f2, width) * alpha2
