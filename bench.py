"""Benchmark: SSL/supervised pretraining throughput on the available accelerator,
one JSON line per workload (all five reference training workloads, SURVEY.md §0).

Baselines (``vs_baseline`` denominators) are derived from artifacts committed in the
reference repo — 100 epochs x 3 seeds x 55k train pairs divided by the committed
wall time (BASELINE.md; reference other_ssl/*/..._performance_summary.txt
``training_time_hours``; CentralNet from training_log_*.csv start-timestamp deltas,
2061 s/seed). No DINO-specific timing is committed, so DINO uses BASELINE.md's
generic ~2700 pairs/sec derivation — conservative for us, since a DINO pair costs
(Ng+Nl) student + Ng teacher view forwards, not one.

Measurement: N steps inside ONE jitted lax.scan, timed end to end with a value fetch
— a single host<->device round trip, so remote-tunnel dispatch latency cannot inflate
(or deflate) the number (the axon relay's block_until_ready is a no-op). Parameters
evolve every step and augmentation keys vary per step, so XLA cannot hoist the model
or view pipeline out of the loop. This is true device throughput; the production
input pipeline overlaps host batch gather with device compute (data/datasets.py
prefetch), so steady-state wall throughput matches it.

Prints one JSON line per workload: {"metric", "value", "unit", "vs_baseline"}
plus, when XLA cost analysis is available: "tflops_per_sec", "mfu_pct",
"hbm_roofline_pct" (clamped <=100; apparent bandwidth above the HBM peak means
VMEM-fed traffic and is reported as "vmem_excess_x" instead), and — for every
row with a measured 8-device collective payload in
docs/collective_profile.json (all eight since round 5) —
"vs_baseline_v5e8_projected" + "collective_overhead_pct".
"""
from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import numpy as np  # noqa: E402

# Reference throughput baselines, pairs- or samples-per-second on 1 GPU.
#   16.5M pairs / (training_time_hours * 3600)
BASE_AUDIO_SIMCLR = 16_500_000 / (1.77 * 3600)   # 2589.6  (audio_simclr summary)
BASE_SIMCLR_MOBILEVIT = 16_500_000 / (1.70 * 3600)  # 2696.1 (audio_simclr_mobilevit)
BASE_MM_SIMCLR = 16_500_000 / (1.65 * 3600)      # 2777.8  (multimodal_simclr summary)
BASE_INFONCE = 16_500_000 / (0.67 * 3600)        # 6840.8  (info_nce summary)
BASE_AE = 16_500_000 / (0.64 * 3600)             # 7161.5  (autoencoder summary)
BASE_MASKED_AE = 16_500_000 / (1.06 * 3600)      # 4324.0  (masked_autoencoder summary)
BASE_CENTRALNET = 5_500_000 / 2061.0             # 2668.6  (training_log timestamps)
BASE_DINO = 2700.0                               # BASELINE.md:33-35 generic SSL rate

# bf16 MXU peak for MFU accounting (v5e: 197 TFLOP/s/chip; "How to Scale Your
# Model" hardware table). Used only when the backend is the TPU relay.
PEAK_FLOPS = {"v5e": 197e12}.get(__import__("os").environ.get(
    "PALLAS_AXON_TPU_GEN", "v5e"), 197e12)
PEAK_HBM = 819e9  # v5e HBM bytes/s — roofline denominator for memory-bound steps
# Roofline semantics (VERDICT r3 #6): the numerator is XLA's post-fusion
# "bytes accessed" — every inter-instruction buffer counted as one HBM write +
# N reads. When the APPARENT bandwidth (bytes/dt) exceeds PEAK_HBM, that is
# physically impossible for HBM-resident traffic; it means part of the modeled
# traffic stayed in VMEM (small working sets), i.e. the program is NOT at the
# HBM wall. We therefore report hbm_roofline_pct clamped to <=100 and expose
# the excess explicitly as vmem_excess_x (apparent/peak) so "at the wall"
# (pct ~100, excess absent) and "VMEM-fed" (excess > 1) are distinguishable.

# Binding resource per row, from the round-5 chip measurements
# (docs/PERF_NOTES.md "Round 5 chip phase"): bottleneck_sweep.py fixed/
# marginal fits + remat A/B. "hbm" = at/near the relay's achievable HBM
# envelope (remat A/B showed traffic is not reducible); "vmem-issue" =
# apparent bandwidth above HBM peak, working sets fusion-resident, bound by
# small-op issue throughput, no fixed-overhead term.
BINDING_RESOURCE = {
    "audio_simclr_pretrain_pairs_per_sec": "hbm",
    "audio_simclr_mobilevit_pretrain_pairs_per_sec": "vmem-issue",
    "multimodal_simclr_pretrain_pairs_per_sec": "vmem-issue",
    "info_nce_pretrain_pairs_per_sec": "hbm",
    "autoencoder_pretrain_samples_per_sec": "hbm",
    "masked_autoencoder_pretrain_samples_per_sec": "vmem-issue",
    "centralnet_supervised_samples_per_sec": "hbm",
    "dino_multi_central_pretrain_pairs_per_sec": "hbm",
}

# v5e-8 projection assumptions for the DINO row (scaling-book ring all-reduce:
# t = 2*(N-1)/N * bytes/ici_bw per op), applied to the MEASURED collective
# payload in docs/collective_profile.json (scripts/collective_profile.py).
ICI_BW = 45e9          # v5e one-way ICI bandwidth per link, bytes/s
ICI_LATENCY_PER_OP = 1e-6  # per-collective launch latency, seconds


def measure(objective, batch, batch_size: int, n_steps: int = 20):
    """(items/sec, achieved FLOP/s, MFU %) for n_steps of objective.step_fn on a
    device-resident batch. FLOPs come from XLA's cost model for the compiled
    whole-scan program (SURVEY.md §5: cost_analysis), so the roofline position is
    reported from artifacts rather than hand math."""
    state = objective.init_fn(jax.random.key(0))
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    # The batch is an ARGUMENT, not a closure: a closed-over array is embedded
    # in the HLO as a constant, which blows the relay's compile-payload limit
    # at batch >= 1024 (docs/PERF_NOTES.md, round-3 roofline section).
    @jax.jit
    def run_steps(state, batch, key):
        def body(s, k):
            s, metrics = objective.step_fn(s, batch, k)
            return s, metrics["train_loss"]

        keys = jax.random.split(key, n_steps)
        return jax.lax.scan(body, state, keys)

    compiled = run_steps.lower(state, batch, jax.random.key(1)).compile()
    # XLA's cost model counts a while-loop (lax.scan) BODY ONCE, not times the
    # trip count — verified against a scan-free single-step compile
    # (scripts/roofline.py: 1554 GFLOP/step for DINO@1024 vs ~82 GFLOP reported
    # for the whole 20-step scan program). Scale by n_steps so achieved-FLOPs
    # and the roofline percentages describe the measured execution.
    program_flops = program_bytes = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        program_flops = n_steps * float(ca.get("flops", 0.0)) or None
        program_bytes = n_steps * float(ca.get("bytes accessed", 0.0)) or None
    except Exception:
        pass
    state, losses = compiled(state, batch, jax.random.key(1))  # warmup execution
    assert np.isfinite(float(losses[-1]))
    t0 = time.perf_counter()
    state, losses = compiled(state, batch, jax.random.key(2))
    final = float(losses[-1])  # value fetch forces real execution through the relay
    dt = time.perf_counter() - t0
    assert np.isfinite(final)
    achieved = program_flops / dt if program_flops else None
    mfu = 100.0 * achieved / PEAK_FLOPS if achieved else None
    apparent_bw = (program_bytes / dt) if program_bytes else None
    return n_steps * batch_size / dt, achieved, mfu, apparent_bw, dt / n_steps


def workloads():
    """Yields (metric, unit, batch_size, baseline, build) for every reference
    training workload. ``build(mesh=None)`` constructs the production
    objective; the optional mesh threads into the factories that carry an
    augment bank (DINO/SimCLR — shard_map'd local augmentation), so
    scripts/collective_profile.py profiles the SAME programs bench measures."""
    from avmnist_tpu.objectives.autoencoder import (AutoencoderConfig,
                                                    make_autoencoder_objective)
    from avmnist_tpu.objectives.dino import DinoConfig, make_dino_objective
    from avmnist_tpu.objectives.infonce import InfoNCEConfig, make_infonce_objective
    from avmnist_tpu.objectives.simclr import SimCLRConfig, make_simclr_objective
    from avmnist_tpu.objectives.supervised import make_centralnet_objective

    yield ("audio_simclr_pretrain_pairs_per_sec", "pairs/sec/chip", 1024,
           BASE_AUDIO_SIMCLR,
           lambda mesh=None: make_simclr_objective(SimCLRConfig(
               audio_only=True, output_dim=256, projection_dim=128,
               learning_rate=1e-4), mesh=mesh))
    # Batch 512: round-5 sweep at bench conditions (20-step scans) measured
    # 512 fastest (41.3k vs 40.3k at 1024); zero fixed-overhead term — the
    # row is small-op/VMEM-issue-bound, not dispatch (bottleneck_sweep.py).
    yield ("audio_simclr_mobilevit_pretrain_pairs_per_sec", "pairs/sec/chip", 512,
           BASE_SIMCLR_MOBILEVIT,
           lambda mesh=None: make_simclr_objective(SimCLRConfig(
               audio_only=True, audio_encoder_name="spectrogram_mobile_vit",
               output_dim=256, projection_dim=128, learning_rate=1e-4),
               mesh=mesh))
    yield ("multimodal_simclr_pretrain_pairs_per_sec", "pairs/sec/chip", 1024,
           BASE_MM_SIMCLR,
           lambda mesh=None: make_simclr_objective(SimCLRConfig(
               audio_only=False, output_dim=256, projection_dim=128,
               learning_rate=1e-4), mesh=mesh))
    # InfoNCE/AE/CentralNet have no augment bank; GSPMD propagates their batch
    # sharding cleanly (round-4 measurement: 7.56-7.98x per-device FLOP
    # reduction unaffected), so their factories take no mesh.
    yield ("info_nce_pretrain_pairs_per_sec", "pairs/sec/chip", 1024,
           BASE_INFONCE,
           lambda mesh=None: make_infonce_objective(InfoNCEConfig()))
    yield ("autoencoder_pretrain_samples_per_sec", "samples/sec/chip", 512,
           BASE_AE,
           lambda mesh=None: make_autoencoder_objective(
               AutoencoderConfig(variant="plain")))
    # Batch 1024: measured fastest at bench conditions (20-step scans:
    # 83.1k vs 81.7k samples/s at 512, scripts/bottleneck_sweep.py round 5).
    yield ("masked_autoencoder_pretrain_samples_per_sec", "samples/sec/chip", 1024,
           BASE_MASKED_AE,
           lambda mesh=None: make_autoencoder_objective(
               AutoencoderConfig(variant="masked")))
    yield ("centralnet_supervised_samples_per_sec", "samples/sec/chip", 1024,
           BASE_CENTRALNET,
           lambda mesh=None: make_centralnet_objective())
    # Batch 1024: the DINO step saturates device throughput at ~1k pairs
    # (round-3 profile: 9.1k/s @256, 10.0k @512, 10.2k @1024 — memory-bound,
    # docs/PERF_NOTES.md roofline section).
    yield ("dino_multi_central_pretrain_pairs_per_sec", "pairs/sec/chip", 1024,
           BASE_DINO,
           lambda mesh=None: make_dino_objective(
               DinoConfig(model_name="multi_central"), mesh=mesh))


def _v5e8_projection(metric: str, step_time: float, rate: float,
                     baseline: float, batch_size: int):
    """Projected v5e-8 multiple for a bench row from the MEASURED collective
    payload (docs/collective_profile.json; scripts/collective_profile.py
    extracts every collective from each workload's optimized 8-device SPMD
    HLO — every row, not just DINO, since round 5). Weak scaling: each chip
    keeps THIS bench's batch, so the gradient all-reduce payload is used as
    measured (parameter-sized, batch-independent) while batch-shaped
    collectives (all-gather/all-to-all/permute — contrastive-negatives
    gathers scale with the global similarity matrix's rows) scale with
    global batch relative to the profiled batch. Ring all-reduce model;
    assumptions (ICI_BW, ICI_LATENCY_PER_OP) are module constants."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "docs", "collective_profile.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        doc = json.load(f)
    prof = doc.get("workloads", {}).get(metric)
    if prof is None:
        return None
    n = doc["n_devices"]
    by_kind = prof.get("collective_bytes_by_kind", {})
    # Weak scaling: every chip keeps THIS bench's batch, so the projected
    # GLOBAL batch is batch_size*n; the augment-boundary resharding kinds
    # scale linearly with it (measured linear 16->512, PERF_NOTES round-4),
    # the gradient all-reduce does not (byte-identical across batches).
    scale = (batch_size * n) / prof.get("global_batch", batch_size * n)
    # Per-kind ring/ICI cost factors (bytes -> wire traffic per device):
    #   all-reduce 2(N-1)/N, all-gather/reduce-scatter/all-to-all (N-1)/N of
    #   the op's (full) payload, collective-permute 1x its per-device payload.
    factors = {"all-reduce": 2 * (n - 1) / n, "all-gather": (n - 1) / n,
               "reduce-scatter": (n - 1) / n, "all-to-all": (n - 1) / n,
               "collective-permute": 1.0}
    batch_prop = {"all-gather", "all-to-all", "collective-permute"}
    t_coll = prof["collective_ops"] * ICI_LATENCY_PER_OP
    coll_bytes = 0.0
    for kind, size in by_kind.items():
        s = size * (scale if kind in batch_prop else 1.0)
        coll_bytes += s
        t_coll += factors.get(kind, 1.0) * s / ICI_BW
    projected_rate = n * rate / (1 + t_coll / step_time)
    return {
        "vs_baseline_v5e8_projected": round(projected_rate / baseline, 2),
        "collective_bytes_per_step": int(coll_bytes),
        "collective_overhead_pct": round(100 * t_coll / step_time, 3),
    }


def main():
    from avmnist_tpu.data.synthetic import make_synthetic_avmnist

    train, _ = make_synthetic_avmnist(n_train=1024, n_test=8, seed=0)
    for metric, unit, batch_size, baseline, build in workloads():
        try:
            batch = train.gather(np.arange(batch_size) % len(train.labels))
            rate, achieved, mfu, apparent_bw, step_time = measure(
                build(), batch, batch_size)
            row = {
                "metric": metric,
                "value": round(rate, 1),
                "unit": unit,
                "vs_baseline": round(rate / baseline, 2),
            }
            if mfu is not None:
                row["tflops_per_sec"] = round(achieved / 1e12, 2)
                row["mfu_pct"] = round(mfu, 2)
            if apparent_bw is not None:
                # <=100 by construction; excess apparent bandwidth = VMEM-fed
                # traffic, surfaced as its own factor (see PEAK_HBM comment).
                row["hbm_roofline_pct"] = round(
                    min(100.0, 100.0 * apparent_bw / PEAK_HBM), 2)
                if apparent_bw > PEAK_HBM:
                    row["vmem_excess_x"] = round(apparent_bw / PEAK_HBM, 2)
            if metric in BINDING_RESOURCE:
                row["binding_resource"] = BINDING_RESOURCE[metric]
            proj = _v5e8_projection(metric, step_time, rate, baseline,
                                    batch_size)
            if proj:
                row.update(proj)
            print(json.dumps(row), flush=True)
        except Exception as e:  # keep emitting the remaining workloads
            print(json.dumps({"metric": metric, "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
