"""Benchmark: SSL pretraining throughput (pairs/sec) on the available accelerator.

Workload: multimodal SimCLR training step — the workload behind BASELINE.md's derived
~2700 pairs/sec single-GPU reference (small SimCLR models, 1.7h / 100 epochs x 3 seeds
x 55k pairs) — at the reference batch size, INCLUDING the two-view augmentation bank,
which the reference runs on CPU workers and we run fused on device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import numpy as np

BASELINE_PAIRS_PER_SEC = 2700.0  # BASELINE.md derived throughput reference


def main():
    from avmnist_tpu.data.synthetic import make_synthetic_avmnist
    from avmnist_tpu.objectives.simclr import SimCLRConfig, make_simclr_objective

    batch_size = 1024  # per-chip; throughput metric (reference trains at 128 on GPU)
    cfg = SimCLRConfig(output_dim=256, projection_dim=256, learning_rate=1e-4)
    objective = make_simclr_objective(cfg)
    state = objective.init_fn(jax.random.key(0))

    train, _ = make_synthetic_avmnist(n_train=batch_size, n_test=8, seed=0)
    batch = {k: jax.device_put(v) for k, v in train.gather(np.arange(batch_size)).items()}

    rng = jax.random.key(1)
    # warmup + compile
    for i in range(3):
        rng, k = jax.random.split(rng)
        state, metrics = objective.step_fn(state, batch, k)
    jax.block_until_ready(metrics["train_loss"])

    n_steps = 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        rng, k = jax.random.split(rng)
        state, metrics = objective.step_fn(state, batch, k)
    jax.block_until_ready(metrics["train_loss"])
    dt = time.perf_counter() - t0

    pairs_per_sec = n_steps * batch_size / dt
    print(json.dumps({
        "metric": "simclr_pretrain_pairs_per_sec",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
