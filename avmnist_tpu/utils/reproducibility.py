"""Determinism helpers.

TPU-native equivalent of the reference's ``utils/reproducibility.py:1-22`` (which seeds
python/numpy/torch and forces cuDNN determinism). In JAX, determinism is structural:
all randomness flows through explicit PRNG keys, and XLA:TPU compilations are
deterministic for a fixed program + seed, so no global flags are needed. What remains
host-side (epoch shuffles, split permutations) is seeded here.
"""
from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int = 1) -> np.random.Generator:
    """Seed host-side RNGs and return a dedicated numpy Generator.

    Mirrors reference utils/reproducibility.py:8-22 (minus the torch/CUDA flags, which
    have no JAX analog: jit-compiled TPU programs are deterministic by construction).
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return np.random.default_rng(seed)


def data_rng(seed: int, epoch: int = 0) -> np.random.Generator:
    """Independent stream for data-order decisions (split/shuffle) per (seed, epoch)."""
    return np.random.default_rng(np.random.SeedSequence([seed, epoch, 0x5EED]))
