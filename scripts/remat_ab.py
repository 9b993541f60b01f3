"""A/B the rematerialization levers on the chip (VERDICT r4 #3: close what's
closable in the single-chip gap).

Every bench workload with a remat flag is measured remat-off vs remat-on at
its bench batch, using bench.measure's hoist-proof 20-step scan. The step is
HBM-bandwidth-bound across the board (docs/PERF_NOTES.md roofline table), so
recomputing forward activations in the backward (save-nothing jax.checkpoint)
trades HBM traffic the step cannot afford for MXU FLOPs it has to spare.

    python scripts/remat_ab.py [--iters 20] [--only dino simclr ...]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", nargs="+", default=None)
    args = ap.parse_args()

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import bench
    from avmnist_tpu.data.synthetic import make_synthetic_avmnist
    from avmnist_tpu.objectives.autoencoder import (AutoencoderConfig,
                                                    make_autoencoder_objective)
    from avmnist_tpu.objectives.dino import DinoConfig, make_dino_objective
    from avmnist_tpu.objectives.simclr import SimCLRConfig, make_simclr_objective

    cases = [
        ("dino_multi_central", 1024, lambda r: make_dino_objective(
            DinoConfig(model_name="multi_central", remat_student=r))),
        ("audio_simclr", 1024, lambda r: make_simclr_objective(SimCLRConfig(
            audio_only=True, output_dim=256, projection_dim=128,
            learning_rate=1e-4, remat=r))),
        ("audio_simclr_mobilevit", 512, lambda r: make_simclr_objective(
            SimCLRConfig(audio_only=True,
                         audio_encoder_name="spectrogram_mobile_vit",
                         output_dim=256, projection_dim=128,
                         learning_rate=1e-4, remat=r))),
        ("multimodal_simclr", 1024, lambda r: make_simclr_objective(
            SimCLRConfig(audio_only=False, output_dim=256, projection_dim=128,
                         learning_rate=1e-4, remat=r))),
        ("autoencoder", 512, lambda r: make_autoencoder_objective(
            AutoencoderConfig(variant="plain", remat=r))),
        ("masked_autoencoder", 512, lambda r: make_autoencoder_objective(
            AutoencoderConfig(variant="masked", remat=r))),
    ]
    train, _ = make_synthetic_avmnist(n_train=1024, n_test=8, seed=0)
    for name, bs, build in cases:
        if args.only and not any(s in name for s in args.only):
            continue
        batch = train.gather(np.arange(bs) % 1024)
        rec = {"workload": name, "batch": bs}
        for label, remat in (("off", False), ("on", True)):
            try:
                rate, _, mfu, bw, step = bench.measure(
                    build(remat), batch, bs, n_steps=args.iters)
                rec[f"remat_{label}"] = {
                    "rate": round(rate, 1), "step_ms": round(step * 1e3, 2),
                    "mfu_pct": round(mfu, 2) if mfu else None}
            except Exception as e:
                rec[f"remat_{label}"] = {"error": f"{type(e).__name__}: {e}"}
        on, off = rec.get("remat_on", {}), rec.get("remat_off", {})
        if "rate" in on and "rate" in off:
            rec["speedup"] = round(on["rate"] / off["rate"], 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
