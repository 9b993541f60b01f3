"""Roofline position of any workload's step from XLA's cost model (no timing).

Compiles objective.step_fn at the given batch sizes and prints flops, bytes
accessed, and the implied HBM-bound / MXU-bound step-time floors for a v5e
chip (197 bf16 TFLOP/s, 819 GB/s HBM). Compile-only — safe to run while the
chip is busy; the numbers are static properties of the compiled program.

    python scripts/roofline.py --workload info_nce --batch 1024 2048
    python scripts/roofline.py --workload dino --model multi_central --batch 1024
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

PEAK_FLOPS = 197e12  # v5e bf16 MXU
PEAK_HBM = 819e9     # v5e HBM bytes/s


def build(workload: str, model: str, identity_augment: bool):
    if workload == "dino":
        from avmnist_tpu.objectives.dino import DinoConfig, make_dino_objective
        return make_dino_objective(DinoConfig(
            model_name=model, identity_augment=identity_augment))
    if workload == "info_nce":
        from avmnist_tpu.objectives.infonce import (InfoNCEConfig,
                                                    make_infonce_objective)
        return make_infonce_objective(InfoNCEConfig())
    if workload == "audio_simclr":
        from avmnist_tpu.objectives.simclr import (SimCLRConfig,
                                                   make_simclr_objective)
        return make_simclr_objective(SimCLRConfig(
            audio_only=True, output_dim=256, projection_dim=128))
    if workload == "multimodal_simclr":
        from avmnist_tpu.objectives.simclr import (SimCLRConfig,
                                                   make_simclr_objective)
        return make_simclr_objective(SimCLRConfig(
            audio_only=False, output_dim=256, projection_dim=128))
    if workload in ("autoencoder", "masked_autoencoder"):
        from avmnist_tpu.objectives.autoencoder import (
            AutoencoderConfig, make_autoencoder_objective)
        return make_autoencoder_objective(AutoencoderConfig(
            variant="plain" if workload == "autoencoder" else "masked"))
    if workload == "centralnet":
        from avmnist_tpu.objectives.supervised import make_centralnet_objective
        return make_centralnet_objective()
    raise SystemExit(f"unknown workload {workload}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="dino")
    ap.add_argument("--model", default="multi_central")
    ap.add_argument("--batch", type=int, nargs="+", default=[1024])
    ap.add_argument("--identity-augment", action="store_true")
    args = ap.parse_args()

    from avmnist_tpu.data.synthetic import make_synthetic_avmnist

    train, _ = make_synthetic_avmnist(n_train=2048, n_test=8, seed=0)

    for bs in args.batch:
        obj = build(args.workload, args.model, args.identity_augment)
        batch = train.gather(np.arange(bs) % 2048)
        state = obj.init_fn(jax.random.key(0))
        compiled = jax.jit(obj.step_fn).lower(
            state, batch, jax.random.key(1)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        print(json.dumps({
            "workload": args.workload,
            "model": args.model if args.workload == "dino" else None,
            "batch": bs,
            "gflops_per_step": round(flops / 1e9, 2),
            "gbytes_accessed_per_step": round(byts / 1e9, 3),
            "arithmetic_intensity_flops_per_byte":
                round(flops / byts, 2) if byts else None,
            "mxu_floor_ms": round(flops / PEAK_FLOPS * 1e3, 2),
            "hbm_floor_ms": round(byts / PEAK_HBM * 1e3, 2),
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
