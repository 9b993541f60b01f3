"""Shared objective plumbing: normalization, mixed precision, the Objective bundle."""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def normalize_images(image: jnp.ndarray) -> jnp.ndarray:
    """(B, 28, 28) raw 0..255 -> (B, 28, 28, 1) float /255 (get_data.py:464-465)."""
    x = image.astype(jnp.float32) / 255.0
    return x[..., None] if x.ndim == 3 else x


def normalize_audio(audio: jnp.ndarray, mean: float = 0.0, std: float = 1.0) -> jnp.ndarray:
    """uint8 (B, 112, 112) -> float (B, 112, 112, 1); (x/255 - mean)/std with
    defaults 0/1 (get_data.py:439-442, 466-467)."""
    x = audio.astype(jnp.float32) / 255.0
    x = (x - mean) / std
    return x[..., None] if x.ndim == 3 else x


def per_step_rng(rng, state):
    """REQUIRED first rng op of every ``step_fn``: derive the step's PRNG stream.

    The training loops pass ONE key per epoch (zero per-step host dispatches —
    docs/PERF_NOTES.md) and rely on every objective folding ``state.step`` into it;
    an objective that skips this silently reuses a single stream for every step of
    an epoch (identical augmentations/masks all epoch). Use this helper instead of
    calling ``jax.random.fold_in`` by hand so the contract can't be forgotten."""
    return jax.random.fold_in(rng, state.step)


def anchor_data_sharding(x, mesh):
    """Re-anchor the leading (batch) dimension of ``x`` (array or pytree) onto
    the mesh's data axis.

    WHY THIS EXISTS: the on-device augmentation region (per-sample RNG streams
    + retry-RRC gathers) defeats GSPMD's sharding propagation. Without an
    explicit constraint on the augmented views, XLA all-gathers them and
    REPLICATES the entire network forward/backward on every device — measured
    on the 8-device mesh as per-device FLOPs identical to the 1-device compile
    (round-4 finding; scripts/collective_profile.py artifact). Anchoring the
    views' batch dim restores data-parallel partitioning: per-device FLOPs drop
    ~n_devices-fold and XLA inserts the gradient/BN/center all-reduces.

    No-op when ``mesh`` is None (single-device paths and tests). An Objective
    built with a mesh binds to THAT mesh (step_fn traces the constraint in);
    build a fresh objective for a different mesh — same contract as the
    resident-program cache (train/loops.py)."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec("data"))
    return jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, sharding), x)


def shard_map_augment(augment_fn, mesh):
    """Run an augmentation bank under ``shard_map`` over the mesh's data axis,
    so each device augments its LOCAL batch shard with purely local compute.

    WHY THIS EXISTS: even with the folded views anchored onto the data axis
    (anchor_data_sharding), GSPMD chooses to partition the augment region
    SPATIALLY (over H/W) and must reshard to the batch sharding at the fold
    boundary — measured at 1.24 GB/step of all-gather + all-to-all +
    collective-permute on view tensors at global batch 8192 (~25 % of the
    8-device DINO step, docs/collective_profile.json round 4). Under
    shard_map the partitioner cannot make that choice: the bank is local by
    construction and the resharding term is deleted entirely
    (docs/PERF_NOTES.md round-5 section).

    RNG SEMANTICS (docs/DEVIATIONS.md "Meshed augmentation RNG streams"):
    each device folds its data-axis position into the step key, so parameter
    draws under a mesh are a different (distributionally identical) stream
    than the unmeshed batched draws. Meshed-vs-unmeshed exactness therefore
    holds only for augment-free configs (``identity_augment``), which is what
    the equivalence tests and the driver dryrun pin; full-augment equivalence
    is distributional (tests/test_parallel_scaling.py).

    ``augment_fn(images, audios, key) -> pytree of (B, ...) arrays``; the
    global batch must divide the data-axis size (shard_batch guarantees it).
    """
    if mesh is None:
        return augment_fn
    from jax.sharding import PartitionSpec

    data = PartitionSpec("data")

    def local_fn(images, audios, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return augment_fn(images, audios, key)

    return jax.shard_map(local_fn, mesh=mesh,
                         in_specs=(data, data, PartitionSpec()),
                         out_specs=data)


def cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean CE over (optionally padded) batch — torch nn.CrossEntropyLoss semantics."""
    ce = optax.softmax_cross_entropy_with_integer_labels(logits.astype(jnp.float32), labels)
    if valid is None:
        return ce.mean()
    b = logits.shape[0]
    mask = jnp.arange(b) < valid
    return (ce * mask).sum() / jnp.maximum(valid, 1)


@dataclasses.dataclass
class Objective:
    """A training workload: jitted pure step functions + metadata.

    ``init_fn(rng) -> TrainState`` (host-called once, then replicated over the mesh);
    ``step_fn(state, batch, rng) -> (state, metrics)`` — the fused train step.
    CONTRACT: ``rng`` is a per-EPOCH key; the step_fn MUST derive its stream via
    ``per_step_rng(rng, state)`` (fold in state.step) before any random op;
    ``eval_fn(state, batch) -> metrics/outputs`` (optional);
    ``feature_fn(state, batch) -> features`` frozen-encoder features for probes.
    """

    name: str
    init_fn: Callable
    step_fn: Callable
    eval_fn: Optional[Callable] = None
    feature_fn: Optional[Callable] = None
    meta: Dict[str, Any] = dataclasses.field(default_factory=dict)
