"""Device-resident dataset: upload a split once, gather every batch on device.

Motivation (measured on the v5e relay, docs/PERF_NOTES.md): host->device
transfers run at ~28 MB/s, so streaming 2 MB AVMNIST batches costs ~70 ms
against an 11.4 ms DINO device step — the input pipeline, not compute, was the
wall. The whole 55k train split is only 733 MB uint8 (audio 112x112 + image
28x28 + labels), a rounding error against 16 GB HBM. So the TPU-native input
pipeline is: ONE upload per experiment, then each epoch runs as a single jitted
``lax.scan`` whose body gathers its minibatch from the resident arrays by row
index (rows are 12.5 KB contiguous, so the gather rides HBM bandwidth, not the
scalar-gather path). Host traffic per epoch: one (n_steps, B) int32 index
matrix up (~220 KB), one metrics tree down.

This replaces the reference's multi-worker DataLoader streaming
(utils/get_data.py:513-741) — on TPU the dataset is small and HBM is big, so
"loading" is a one-time placement, not a per-step pipeline.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from avmnist_tpu.utils.reproducibility import data_rng


class ResidentSplit:
    """A DataSplit uploaded to device HBM, plus index-plan helpers.

    ``arrays`` maps image/audio/label to device arrays in split order (device
    row j == split position j), replicated over the mesh when one is given.
    ``host_labels`` stays on host for probe bookkeeping (tiny).
    """

    def __init__(self, split, mesh=None):
        import jax

        n = len(split)
        host = split.gather(np.arange(n)) if hasattr(split, "gather") else {
            "image": split.image, "audio": split.audio, "label": split.label}
        host.pop("valid", None)
        self.n = n
        self.host_labels = np.asarray(host["label"])
        if mesh is not None:
            from avmnist_tpu.parallel.mesh import replicated

            rep = replicated(mesh)
            self.arrays: Dict = {k: jax.device_put(v, rep) for k, v in host.items()}
        else:
            self.arrays = {k: jax.device_put(v) for k, v in host.items()}
        self.mesh = mesh

    def __len__(self) -> int:
        return self.n

    def train_index(self, batch_size: int, seed: int, epoch: int) -> np.ndarray:
        """(n_steps, B) shuffled epoch plan — bit-identical batch composition to
        ``Batches(split, batch_size, shuffle=True, seed=seed)`` at this epoch
        (same data_rng(seed, epoch) permutation, same drop-remainder)."""
        order = data_rng(seed, epoch).permutation(self.n)
        n_steps = self.n // batch_size
        return order[: n_steps * batch_size].reshape(n_steps, batch_size).astype(np.int32)

    def eval_index(self, batch_size: int):
        """Sequential padded plan: ((n_batches, B) indices, (n_batches,) valid) —
        mirrors ``Batches(..., shuffle=False, drop_remainder=True, pad_final=True)``."""
        n_steps = -(-self.n // batch_size)
        idx = np.arange(n_steps * batch_size, dtype=np.int32)
        valid = np.full(n_steps, batch_size, dtype=np.int32)
        tail = self.n - (n_steps - 1) * batch_size
        if tail < batch_size:
            valid[-1] = tail
            # pad by repeating the final row (Batches pads with pos[-1:])
            idx[self.n:] = self.n - 1
        return idx.reshape(n_steps, batch_size), valid


def as_resident(split, mesh=None) -> ResidentSplit:
    return split if isinstance(split, ResidentSplit) else ResidentSplit(split, mesh)
