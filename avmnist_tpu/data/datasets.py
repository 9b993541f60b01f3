"""Deterministic splits + host batch iterators with device prefetch.

Replaces the reference's torch ``random_split`` + DataLoader stack
(get_data.py:513-741). Differences by design:

- The 55000/5000 train/val split is a seeded numpy permutation (the reference's torch
  generator split is RNG-library-specific; parity is defined distributionally).
- Batches are gathered as whole numpy slabs (vectorized fancy indexing on the memmap)
  instead of per-sample ``__getitem__`` + collate across worker processes.
- Per-sample CPU augmentation is GONE: batches carry raw pixels, and the multi-crop /
  SimCLR view pipelines run fused on device (see avmnist_tpu.augment).
- ``prefetch_to_device`` keeps a small pipeline of batches in flight so host gather
  overlaps device compute (the TPU analog of DataLoader prefetching).
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, Iterable, Iterator, Optional, Sequence

import numpy as np

from avmnist_tpu.data.memmap import AVMNISTArrays
from avmnist_tpu.utils.reproducibility import data_rng


@dataclasses.dataclass
class DataSplit:
    """Index-based view over an AVMNISTArrays (analog of torch Subset)."""

    arrays: AVMNISTArrays
    indices: np.ndarray

    def __len__(self) -> int:
        return len(self.indices)

    def gather(self, pos: np.ndarray) -> Dict[str, np.ndarray]:
        return self.arrays.gather(self.indices[pos])


def host_shard(data, process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> "DataSplit":
    """Per-host shard of a dataset for multi-host training (SURVEY.md §5: "input
    pipeline: per-host sharded file reads of the same memmap .npys").

    Each process reads a disjoint strided slice; combined with per-host device batches
    under `jax.make_array_from_process_local_data`-style assembly or simple
    data-parallel fit where every host owns 1/P of the global batch."""
    import jax

    p = process_index if process_index is not None else jax.process_index()
    n = process_count if process_count is not None else jax.process_count()
    base_indices = data.indices if isinstance(data, DataSplit) else np.arange(len(data))
    arrays = data.arrays if isinstance(data, DataSplit) else data
    return DataSplit(arrays, base_indices[p::n])


def split_train_val(
    arrays: AVMNISTArrays,
    train_size: int = 55000,
    val_size: int = 5000,
    seed: int = 0,
):
    """Seeded random train/val split (reference get_data.py:606-609, 55000/5000)."""
    n = len(arrays)
    if train_size + val_size > n:
        raise ValueError(f"split {train_size}+{val_size} > dataset size {n}")
    perm = data_rng(seed).permutation(n)
    return (
        DataSplit(arrays, np.sort(perm[:train_size])),
        DataSplit(arrays, np.sort(perm[train_size : train_size + val_size])),
    )


class Batches:
    """Re-iterable epoch batcher over a DataSplit or AVMNISTArrays.

    - ``shuffle=True``: new permutation per epoch, seeded by (seed, epoch).
    - ``drop_remainder=True`` keeps shapes static for jit (train); eval pads the final
      batch and reports a ``valid`` count so metrics stay exact.
    """

    def __init__(
        self,
        data,
        batch_size: int = 128,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = True,
        pad_final: bool = False,
    ):
        self.data = data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.pad_final = pad_final
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.data)
        if self.drop_remainder and not self.pad_final:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.data)
        order = (
            data_rng(self.seed, self.epoch).permutation(n)
            if self.shuffle
            else np.arange(n)
        )
        self.epoch += 1
        bs = self.batch_size
        stop = (n // bs) * bs if (self.drop_remainder and not self.pad_final) else n
        for start in range(0, stop, bs):
            pos = order[start : start + bs]
            valid = len(pos)
            if valid < bs:
                if not self.pad_final:
                    break
                pos = np.concatenate([pos, np.repeat(pos[-1:], bs - valid)])
            batch = self.data.gather(pos)
            batch["valid"] = np.asarray(valid, dtype=np.int32)
            yield batch


def prefetch_to_device(
    iterable: Iterable[Dict[str, np.ndarray]],
    size: int = 2,
    sharding=None,
):
    """Keep ``size`` batches in flight on device.

    With a NamedSharding over the data axis, each batch lands pre-sharded so the jitted
    step never sees a host->device transfer on its critical path.
    """
    import jax

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        # Per-leaf sharding: batch-dim arrays shard over data axis, scalars replicate.
        put_leaf = lambda x: jax.device_put(x, sharding if np.ndim(x) > 0 else None)
        return {k: put_leaf(v) for k, v in batch.items()}

    it = iter(iterable)
    queue = []
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        head = queue.pop(0)
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield head
