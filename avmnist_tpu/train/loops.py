"""Generic training/eval loops: one implementation instead of the reference's five
copies (dino_train.py / ssl_train.py / centralnet_train.py / unimodal.py / notebooks).

The loop stays off the critical path: batches stream through ``prefetch_to_device``
(pre-sharded over the mesh), the jitted step runs async, and metrics are only pulled
to host once per epoch.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avmnist_tpu.data.datasets import Batches, prefetch_to_device
from avmnist_tpu.data.resident import ResidentSplit
from avmnist_tpu.objectives.common import Objective
from avmnist_tpu.parallel.mesh import batch_sharding, replicate_state
from avmnist_tpu.train.state import TrainState


def resident_gather(data: Dict, idx, mesh=None):
    """Minibatch by row-gather from resident device arrays (contiguous rows ->
    HBM-bandwidth gather). Under a mesh the batch is constrained onto the data
    axis so the step's collectives see the same sharding as the streaming path."""
    batch = {k: v[idx] for k, v in data.items()}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        batch = jax.lax.with_sharding_constraint(
            batch, NamedSharding(mesh, PartitionSpec("data")))
    batch["valid"] = jnp.asarray(idx.shape[0], jnp.int32)
    return batch


def _resident_programs(objective: Objective, mesh):
    """Whole-epoch jitted programs over a ResidentSplit, cached per (objective, mesh).

    One dispatch + one host sync per EPOCH: the scan body gathers each minibatch
    on device and runs the already-jitted step inline. This is the production
    analog of bench.py's measurement harness — the input pipeline is a 220 KB
    index-matrix upload, so the 28 MB/s relay H2D path (docs/PERF_NOTES.md)
    carries no pixels at all."""
    cache = objective.meta.setdefault("_resident_progs", {})
    key = None if mesh is None else id(mesh)
    if key not in cache:

        @jax.jit
        def train_epoch(state, data, plan, rng):
            def body(st, idx):
                st, m = objective.step_fn(st, resident_gather(data, idx, mesh), rng)
                return st, m

            state, ms = jax.lax.scan(body, state, plan)
            return state, jax.tree.map(lambda x: x.mean(0), ms)

        eval_epoch = None
        if objective.eval_fn is not None:

            @jax.jit
            def eval_epoch(state, data, plan, valids):
                def body(_, iv):
                    idx, v = iv
                    b = resident_gather(data, idx, mesh)
                    b["valid"] = v
                    out = objective.eval_fn(state, b)
                    return None, (out["loss"], out["logits"])

                _, (losses, logits) = jax.lax.scan(body, None, (plan, valids))
                return losses, logits

        cache[key] = (train_epoch, eval_epoch)
    return cache[key]


def _max_scan_steps() -> Optional[int]:
    """Optional cap on the steps per resident scan program. Some heavy models
    (dual-ViT: ~225 ms/step) make a 429-step epoch a ~97 s device program, which
    crashes the relay's TPU worker (reproducibly; streaming per-step execution of
    the same model is fine). Segmenting the epoch into a few scan calls keeps
    each program short at negligible dispatch cost. Default uncapped;
    ``AVMNIST_MAX_SCAN_STEPS=N`` enables."""
    import os

    v = os.environ.get("AVMNIST_MAX_SCAN_STEPS", "")
    return int(v) if v.isdigit() and int(v) > 0 else None


def _touch_heartbeat() -> None:
    """Liveness signal for the stall watchdog (scripts/run_with_stall_watchdog.sh).

    Phases that write no files for many minutes (e.g. a hyperparameter-search
    trial, which only appends to its trials journal at trial END) are otherwise
    indistinguishable from a TPU-relay RPC stall by the watchdog's
    newest-file-mtime check; touching ``$AVMNIST_HEARTBEAT`` once per epoch
    keeps healthy long phases below the stale threshold."""
    import os

    path = os.environ.get("AVMNIST_HEARTBEAT")
    if path:
        try:
            with open(path, "a"):
                os.utime(path, None)
        except OSError:
            pass


def run_epoch_resident(
    objective: Objective,
    state: TrainState,
    data: ResidentSplit,
    batch_size: int,
    seed: int,
    epoch: int,
    rng,
    mesh=None,
) -> tuple:
    """One epoch as one (or a few, see _max_scan_steps) jitted scans over a
    shuffled index plan (bit-identical batch composition to the streaming path:
    same data_rng(seed, epoch) order)."""
    train_prog, _ = _resident_programs(objective, mesh)
    rng, epoch_rng = jax.random.split(rng)
    plan = data.train_index(batch_size, seed, epoch)
    n = len(plan)
    cap = _max_scan_steps()
    t0 = time.perf_counter()
    if cap is None or n <= cap:
        state, ms = train_prog(state, data.arrays, jnp.asarray(plan), epoch_rng)
        means = {k: float(v) for k, v in jax.device_get(ms).items()}
    else:
        # segments of identical length compile once; the tail (if any) once more.
        parts = []
        for start in range(0, n, cap):
            seg = jnp.asarray(plan[start:start + cap])
            state, ms = train_prog(state, data.arrays, seg, epoch_rng)
            parts.append((len(seg), ms))
        sums: Dict[str, float] = {}
        for k_len, ms in parts:
            for k, v in jax.device_get(ms).items():
                sums[k] = sums.get(k, 0.0) + k_len * float(v)
        means = {k: v / n for k, v in sums.items()}
    wall = time.perf_counter() - t0
    means["epoch_time"] = wall
    means["avg_batch_time"] = wall / max(n, 1)
    means["samples_per_sec"] = n * batch_size / max(wall, 1e-9)
    return state, means, rng


def evaluate_resident(
    objective: Objective,
    state: TrainState,
    data: ResidentSplit,
    batch_size: int = 128,
    mesh=None,
) -> Dict[str, Any]:
    """Exact padded eval as one scan; same outputs as ``evaluate``."""
    _, eval_prog = _resident_programs(objective, mesh)
    plan, valid = data.eval_index(batch_size)
    losses, logits = jax.device_get(
        eval_prog(state, data.arrays, jnp.asarray(plan), jnp.asarray(valid)))
    logits = np.asarray(logits).reshape(-1, logits.shape[-1])[: data.n]
    labels = data.host_labels
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    preds = logits.argmax(-1)
    return {
        "loss": float(np.mean(losses)),
        "accuracy": 100.0 * float((preds == labels).mean()),
        "preds": preds,
        "probs": probs,
        "labels": labels,
    }


def run_epoch(
    objective: Objective,
    state: TrainState,
    batches: Iterable[Dict],
    rng,
    mesh=None,
) -> tuple:
    """One training epoch. Returns (state, mean-metrics dict, wall stats)."""
    sharding = batch_sharding(mesh) if mesh is not None else None
    # One rng op per EPOCH: the step_fns fold state.step into this key, so every
    # step gets a distinct stream with zero per-step host dispatches. Per-step
    # metric accumulation stays on device scalars appended to a Python list (free);
    # a single stacked mean + device_get syncs once per epoch. Under the axon TPU
    # relay each host->device dispatch costs ~2.4 ms — at the reference batch size
    # (128) the old split+add-per-step loop burned 24 ms/step against an 11.8 ms
    # device step (measured v5e, DINO multi_central; docs/PERF_NOTES.md).
    rng, epoch_rng = jax.random.split(rng)
    metric_steps: List[Dict[str, Any]] = []
    n = 0
    t0 = time.perf_counter()
    for batch in prefetch_to_device(batches, size=2, sharding=sharding):
        state, metrics = objective.step_fn(state, batch, epoch_rng)
        metric_steps.append(metrics)
        n += 1
    means = {}
    if metric_steps:
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs).mean(), *metric_steps)
        means = {k: float(v) for k, v in jax.device_get(stacked).items()}
    wall = time.perf_counter() - t0
    means["epoch_time"] = wall
    means["avg_batch_time"] = wall / max(n, 1)
    # pairs/sec — the BASELINE.json primary throughput counter (SURVEY.md §5 tracing)
    means["samples_per_sec"] = n * getattr(batches, "batch_size", 0) / max(wall, 1e-9)
    return state, means, rng


def evaluate(
    objective: Objective,
    state: TrainState,
    batches: Iterable[Dict],
    mesh=None,
) -> Dict[str, Any]:
    """Exact eval over a (padded) split: returns mean loss, accuracy, preds/probs."""
    sharding = batch_sharding(mesh) if mesh is not None else None
    # Keep every per-batch output on device; sync the host exactly once at the end
    # (per-batch device_get serialized the loop under the axon relay).
    dev = []
    for batch in prefetch_to_device(batches, size=2, sharding=sharding):
        out = objective.eval_fn(state, batch)
        dev.append((out["loss"], out["logits"], batch["label"],
                    batch.get("valid", None)))
    losses, n_correct, n_total = [], 0, 0
    all_logits, all_labels = [], []
    for loss, logits, labels, valid in jax.device_get(dev):
        valid = int(valid) if valid is not None else len(labels)
        logits = np.asarray(logits)[:valid]
        labels = np.asarray(labels)[:valid]
        losses.append(float(loss))
        n_correct += int((logits.argmax(-1) == labels).sum())
        n_total += valid
        all_logits.append(logits)
        all_labels.append(labels)
    logits = np.concatenate(all_logits) if all_logits else np.zeros((0, 1))
    labels = np.concatenate(all_labels) if all_labels else np.zeros((0,), int)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    return {
        "loss": float(np.mean(losses)) if losses else float("nan"),
        "accuracy": 100.0 * n_correct / max(n_total, 1),
        "preds": logits.argmax(-1),
        "probs": probs,
        "labels": labels,
    }


def fit(
    objective: Objective,
    train_data,
    epochs: int,
    batch_size: int = 128,
    seed: int = 1,
    mesh=None,
    val_data=None,
    logger=None,
    on_epoch_end: Optional[Callable[[int, TrainState, Dict], Dict]] = None,
    state: Optional[TrainState] = None,
    start_epoch: int = 0,
    rng=None,
    checkpoint_hook: Optional[Callable[[int, TrainState, Any], None]] = None,
) -> tuple:
    """Full training run. ``on_epoch_end(epoch, state, metrics) -> extra metrics`` is
    the hook used for per-epoch probes / best-checkpoint tracking (the analog of
    Lightning callbacks + on_train_epoch_end).

    Mid-run resume (beyond the reference — SURVEY.md §5 'no mid-epoch resume
    anywhere'): pass ``state``/``start_epoch``/``rng`` restored by
    ``checkpoint.load_last`` to continue a killed run. On the resident input
    path the continuation is EXACT (epoch plans are pure functions of
    (seed, epoch)); on the streaming ``Batches`` path the shuffle sequence
    restarts, so batch composition after resume differs. ``checkpoint_hook
    (epoch, state, rng)`` runs after each epoch's hooks — the place to call
    ``checkpoint.save_last``."""
    if rng is None:
        rng = jax.random.key(seed)
    if state is None:
        rng, init_rng = jax.random.split(rng)
        state = objective.init_fn(init_rng)
    if mesh is not None:
        state = replicate_state(state, mesh)
    resident = isinstance(train_data, ResidentSplit)
    if not resident:
        batches = Batches(train_data, batch_size=batch_size, shuffle=True, seed=seed)
    history: List[Dict] = []
    t_start = time.perf_counter()
    for epoch in range(start_epoch, epochs):
        if resident:
            state, metrics, rng = run_epoch_resident(
                objective, state, train_data, batch_size, seed, epoch, rng, mesh)
        else:
            state, metrics, rng = run_epoch(objective, state, batches, rng, mesh)
        if val_data is not None and objective.eval_fn is not None:
            if isinstance(val_data, ResidentSplit):
                val = evaluate_resident(objective, state, val_data, batch_size, mesh)
            else:
                val_batches = Batches(val_data, batch_size=batch_size, shuffle=False,
                                      drop_remainder=True, pad_final=True)
                val = evaluate(objective, state, val_batches, mesh)
            metrics["val_loss"] = val["loss"]
            metrics["val_accuracy"] = val["accuracy"]
        if on_epoch_end is not None:
            metrics.update(on_epoch_end(epoch, state, metrics) or {})
        if checkpoint_hook is not None:
            checkpoint_hook(epoch, state, rng)
        metrics["epoch"] = epoch
        history.append(metrics)
        _touch_heartbeat()
        if logger is not None:
            logger.log_metrics(metrics, step=int(jax.device_get(state.step)))
            # flush each epoch: long runs stay monitorable and a crash loses at
            # most one epoch of metrics (Lightning CSVLogger also writes as it goes)
            logger.save()
    total = time.perf_counter() - t_start
    if logger is not None:
        logger.log_metrics({"total_training_time": total})
        logger.save()
    return state, history
