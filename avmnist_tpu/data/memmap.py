"""Zero-copy readers for the AVMNIST on-disk artifact contract.

Artifact contract (must be honored byte-for-byte, reference get_data.py:412-551 and
audio_gen.ipynb cell 8):

- ``{data_dir}/train_labels.npy`` / ``test_labels.npy``: standard ``.npy`` int labels.
- ``{data_dir}/image/{train,test}_data.npy``: standard ``.npy``, mmap-loadable,
  reshaped to (N, 28, 28), scaled by /255 at consumption time.
- ``{data_dir}/audio/{train,test}_data_augmented_<scheme>.npy``: **headerless raw
  memmap** (written with ``np.memmap(mode='w+')``), uint8, shape (N, 112, 112)
  (reference reads it through a MemmapWrapper, get_data.py:433, 745-764).

Normalization semantics (reference get_data.py:456-472): image/255; audio/255 then
``(x - mean) / std`` with defaults mean=0, std=1 unless ``compute_stats``. In this
framework the /255 + standardization runs **on device** inside the jitted step, so the
host path only gathers raw uint8/float rows.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np

IMAGE_SHAPE = (28, 28)
AUDIO_SHAPE = (112, 112)


def avmnist_paths(data_dir: str, split: str, scheme: str = "burst_noise") -> Dict[str, str]:
    """Path construction, mirroring reference get_data.py:546-551."""
    data_dir = data_dir.rstrip("/")
    return {
        "image": f"{data_dir}/image/{split}_data.npy",
        "audio": f"{data_dir}/audio/{split}_data_augmented_{scheme}.npy",
        "labels": f"{data_dir}/{split}_labels.npy",
    }


@dataclasses.dataclass
class AVMNISTArrays:
    """One split of AVMNIST as lazily-mapped host arrays.

    ``image``: (N, 28, 28) any float/int dtype, raw 0..255 scale.
    ``audio``: (N, 112, 112) uint8 memmap.
    ``labels``: (N,) int64.
    """

    image: np.ndarray
    audio: np.ndarray
    labels: np.ndarray
    audio_mean: float = 0.0
    audio_std: float = 1.0

    def __len__(self) -> int:
        return len(self.labels)

    def gather(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        """Gather rows for a batch. Returns raw (un-normalized) host arrays.

        Images are converted to float32 (still 0..255-scaled when the source is the
        MultiBench float64 npy, which stores 0..255 values); audio stays uint8 to keep
        host->device transfer at 1 byte/px — normalization happens on device.
        Uses the native C gather kernels (data/fastloader.py) when built.
        """
        from avmnist_tpu.data.fastloader import gather_rows

        return {
            "image": gather_rows(self.image, idx, np.float32),
            "audio": gather_rows(self.audio, idx, np.uint8),
            "label": np.ascontiguousarray(self.labels[idx], dtype=np.int32),
        }

    def compute_audio_stats(self) -> Tuple[float, float]:
        """Mean-of-means / mean-of-stds over per-sample audio stats.

        Matches reference semantics (get_data.py:444-451): per-sample mean/std of
        audio/255 are averaged across the dataset (NOT a global mean/std).
        Vectorized here instead of the reference's python loop.
        """
        x = np.asarray(self.audio, dtype=np.float32) / 255.0
        flat = x.reshape(len(x), -1)
        self.audio_mean = float(flat.mean(axis=1).mean())
        self.audio_std = float(flat.std(axis=1).mean())
        return self.audio_mean, self.audio_std


def load_avmnist(
    data_dir: str,
    split: str = "train",
    scheme: str = "burst_noise",
    compute_stats: bool = False,
    n: Optional[int] = None,
) -> AVMNISTArrays:
    """Open one split with the exact reference file layout (get_data.py:412-442)."""
    paths = avmnist_paths(data_dir, split, scheme)
    for p in paths.values():
        if not os.path.exists(p):
            raise FileNotFoundError(f"Data file not found: {p}")
    labels = np.load(paths["labels"]).astype(np.int64)
    if n is not None:
        labels = labels[:n]
    image = np.load(paths["image"], mmap_mode="r")
    image = image.reshape(len(image), *IMAGE_SHAPE)[: len(labels)]
    # Raw headerless memmap (np.load cannot open it) — reference get_data.py:430-433.
    audio = np.memmap(paths["audio"], mode="r", dtype=np.uint8, shape=(len(np.load(paths["labels"])), *AUDIO_SHAPE))[: len(labels)]
    arrays = AVMNISTArrays(image=image, audio=audio, labels=labels)
    if compute_stats:
        arrays.compute_audio_stats()
    return arrays
