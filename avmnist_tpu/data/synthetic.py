"""Synthetic AVMNIST generator (same on-disk artifact contract as the real data).

The reference has no test suite and requires ~GBs of generated data; this module lets
every layer above the data substrate run hermetically. Digits are rendered as crude
class-dependent blob patterns so probes/classifiers have real (learnable) signal.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from avmnist_tpu.data.memmap import AVMNISTArrays, AUDIO_SHAPE, IMAGE_SHAPE, avmnist_paths


def _make_templates(rng: np.random.Generator, shape, n_classes=10):
    """Low-spatial-frequency class templates (coarse random grids upsampled to full
    size) — discriminable by every encoder family including global-average-pooled
    ones like GP_LeNet, whose GAP taps erase fine-grained per-pixel signal."""
    h, w = shape
    gh, gw = 4, 4
    coarse = rng.uniform(0.1, 0.9, size=(n_classes, gh, gw)).astype(np.float32)
    reps_h, reps_w = -(-h // gh), -(-w // gw)
    templates = np.stack([np.kron(c, np.ones((reps_h, reps_w), np.float32))[:h, :w]
                          for c in coarse])
    return templates


def _class_pattern(rng: np.random.Generator, labels: np.ndarray, templates):
    """Shared per-class template + per-sample noise, scaled into uint8 range."""
    x = templates[labels]
    x = x + rng.normal(0.0, 0.15, size=x.shape).astype(np.float32)
    return np.clip(x * 255.0, 0, 255)


def make_synthetic_avmnist(
    data_dir: Optional[str] = None,
    n_train: int = 256,
    n_test: int = 64,
    scheme: str = "burst_noise",
    seed: int = 0,
):
    """Create synthetic train+test splits.

    If ``data_dir`` is given, writes files in the exact reference layout
    (standard .npy images/labels, raw headerless uint8 memmap audio) and returns the
    dir; otherwise returns in-memory AVMNISTArrays pairs (train, test).
    """
    rng = np.random.default_rng(seed)
    img_templates = _make_templates(rng, IMAGE_SHAPE)
    aud_templates = _make_templates(rng, AUDIO_SHAPE)
    splits = {}
    for split, n in (("train", n_train), ("test", n_test)):
        labels = rng.integers(0, 10, size=n).astype(np.int64)
        image = _class_pattern(rng, labels, img_templates).astype(np.float64)
        audio = _class_pattern(rng, labels, aud_templates).astype(np.uint8)
        splits[split] = (image, audio, labels)

    if data_dir is None:
        return (
            AVMNISTArrays(*splits["train"]),
            AVMNISTArrays(*splits["test"]),
        )

    os.makedirs(os.path.join(data_dir, "image"), exist_ok=True)
    os.makedirs(os.path.join(data_dir, "audio"), exist_ok=True)
    for split, (image, audio, labels) in splits.items():
        paths = avmnist_paths(data_dir, split, scheme)
        np.save(paths["labels"], labels)
        np.save(paths["image"], image)
        mm = np.memmap(paths["audio"], mode="w+", dtype=np.uint8, shape=audio.shape)
        mm[:] = audio
        mm.flush()
    return data_dir
