"""Device mesh + sharding helpers — the framework's entire distributed story.

The reference's "parallelism" is a Lightning ``strategy='ddp'`` flag that never runs
multi-GPU (run_gpu.sbatch pins 1 GPU; see SURVEY.md §2e). Here data-parallelism is
first-class and structural:

- a (data, model) ``jax.sharding.Mesh`` over ICI (model axis defaults to 1; present so
  tensor-parallel shardings can be added without API change),
- batches sharded over the data axis; params/optimizer state replicated,
- gradients / batch-norm cross-replica reductions / the DINO center update are plain
  global reductions inside ``jit`` — XLA lowers them to ``psum`` over ICI,
- contrastive similarity matrices are computed on the *global* batch, which is exactly
  "all-gathered negatives": with a sharded batch XLA materializes the all-gather on the
  projection embeddings (tiny: B×128 floats), never on raw pixels.

Multi-host: call ``jax.distributed.initialize()`` before ``create_mesh`` and shard host
data loading by ``jax.process_index()`` — the mesh code below is process-count agnostic.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D (default) or 2-D device mesh. n_data=None uses all devices / n_model."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        devices = devices[: n_data * n_model]
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict on the mesh: arrays sharded on dim 0, scalars replicated."""
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return {
        k: jax.device_put(v, bs if np.ndim(v) > 0 else rep) for k, v in batch.items()
    }


def replicate_state(state, mesh: Mesh):
    """Replicate a pytree (params / train state) across the mesh."""
    rep = replicated(mesh)
    return jax.device_put(state, rep)


def shard_batch_local(local_batch, mesh: Mesh):
    """Multi-host batch entry: every PROCESS passes its host-local rows (its
    ``data.host_shard`` of the global batch) and gets back the global
    batch-sharded ``jax.Array`` — assembled across hosts by
    ``jax.make_array_from_process_local_data`` (DCN for cross-host pieces,
    none needed when each host's rows land on its own devices, which is the
    layout this produces). In a single-process run this is exactly
    ``shard_batch``.

    The global row ORDER is host-major (process 0's rows first) — a fixed
    permutation of the logical batch. Every objective in this framework is
    batch-row-permutation invariant as long as all modalities/labels share
    the permutation (contrastive diagonals pair row i of each modality;
    reductions are means over rows), which host_shard guarantees by slicing
    every array of the batch with the same indices. Executable evidence:
    tests/test_multihost.py simulates two 4-device hosts on the 8-virtual-
    device CPU mesh and pins both the assembled layout and the
    loss-equivalence against the single-host path."""
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return {
        k: (jax.make_array_from_process_local_data(bs, np.asarray(v))
            if np.ndim(v) > 0 else jax.device_put(v, rep))
        for k, v in local_batch.items()
    }
