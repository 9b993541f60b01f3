"""Tracing / FLOPs accounting (reference: torchinfo mult-adds GFLOPs,
run_dino.py:227-281 + dino_train.py:16-45; wall-clock ModelStatsCallback).

TPU-native: XLA's compiled-program ``cost_analysis()`` for FLOPs, ``jax.profiler``
traces for timeline capture, and a timing context for steps/sec + pairs/sec counters
(pairs/sec is BASELINE.json's primary metric)."""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax


def compiled_flops(fn: Callable, *args, **kwargs) -> Optional[float]:
    """FLOPs of the jitted fn at these shapes via XLA cost analysis; None if the
    backend doesn't report it."""
    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops")) if cost and "flops" in cost else None
    except Exception:
        return None


def calculate_gflops(fn: Callable, *args, per_sample_axis: int = 0, **kwargs):
    """Per-sample GFLOPs (the reference normalizes torchinfo mult-adds per sample,
    run_dino.py:243-281). Returns (gflops_per_sample, total_flops)."""
    total = compiled_flops(fn, *args, **kwargs)
    if total is None:
        return None, None
    batch = None
    for a in jax.tree.leaves(args):
        if hasattr(a, "shape") and a.ndim > per_sample_axis:
            batch = a.shape[per_sample_axis]
            break
    per = total / batch / 1e9 if batch else total / 1e9
    return per, total


def param_count(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """steps/sec + items/sec counters (ModelStatsCallback analog, run_dino.py:191-225)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.n_steps = 0
        self.n_items = 0
        self.t0 = time.perf_counter()

    def tick(self, n_items: int = 0):
        self.n_steps += 1
        self.n_items += n_items

    def stats(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return {
            "steps_per_sec": self.n_steps / dt,
            "items_per_sec": self.n_items / dt,
            "avg_batch_time": dt / max(self.n_steps, 1),
            "elapsed": dt,
        }
