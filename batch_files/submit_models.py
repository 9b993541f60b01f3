#!/usr/bin/env python
"""Cluster fan-out: one job per model (reference batch_files/submit_models.py:28-94).

Submits via sbatch when SLURM is available (run_tpu.sbatch), otherwise runs the jobs
sequentially in-process — same flags either way:

    python submit_models.py --models multi_central multi_simple \
        --config config_multimodal_dino.yaml --metric mlp_acc --training_mode default
"""
from __future__ import annotations

import argparse
import shutil
import subprocess
import sys
import time

ALL_MODELS = [
    "multi_simple", "multi_simple_gated", "multi_lstm", "multi_vit",
    "multi_dual_vit", "multi_mobile_vit", "multi_resnet",
    "multi_cross_attention", "multi_central",
    "image_simple", "spectrogram_simple", "spectrogram_central",
    "spectrogram_lstm", "spectrogram_resnet", "spectrogram_vit",
    "spectrogram_mobile_vit",
]

UNIMODAL = {m for m in ALL_MODELS if not m.startswith("multi_")}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="+", choices=ALL_MODELS)
    parser.add_argument("--training_mode", type=str, default="default",
                        choices=["default", "semi_supervised", "mse", "infonce"])
    parser.add_argument("--config", type=str, default="config_multimodal_dino.yaml")
    parser.add_argument("--metric", type=str, default="mlp_acc",
                        choices=["mlp_acc", "train_loss"])
    parser.add_argument("--hyperparameter_tune", action="store_true")
    parser.add_argument("--hyperparameter_tune_augments", action="store_true")
    parser.add_argument("--dry_run", action="store_true", help="print commands only")
    args = parser.parse_args(argv)

    models = args.models or ALL_MODELS
    timestamp = time.strftime("%d%m%Y_%H%M%S")
    mode_name = "" if args.training_mode == "default" else f"_{args.training_mode}"
    use_sbatch = shutil.which("sbatch") is not None

    for model in models:
        model_flag = "--unimodal_model" if model in UNIMODAL else "--model"
        run_args = [model_flag, model, "--training_mode", args.training_mode,
                    "--config", args.config, "--metric", args.metric]
        if args.hyperparameter_tune:
            run_args.append("--hyperparameter_tune")
        if args.hyperparameter_tune_augments:
            run_args.append("--hyperparameter_tune_augments")
        if use_sbatch:
            out = f"{model}{mode_name}_{args.metric}_{timestamp}"
            cmd = ["sbatch", f"--output={out}.out", f"--error={out}.err",
                   "run_tpu.sbatch", *run_args]
        else:
            cmd = [sys.executable, "run_dino.py", *run_args]
        print("Submitting:", " ".join(cmd))
        if not args.dry_run:
            subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()
