"""Non-DINO SSL workloads CLI — the reference's other_ssl notebooks as a script:
audio SimCLR (cnn / mobilenetv3), multimodal SimCLR, multimodal InfoNCE, and the
(masked) audio autoencoders, each trained over seeds {1,2,3} with per-modality
kNN+MLP probes and optional late-fusion evaluation (ssl_train.py harness)."""
from __future__ import annotations

import argparse
import os

WORKLOADS = (
    "audio_simclr", "audio_simclr_mobilevit", "multimodal_simclr", "info_nce",
    "autoencoder", "masked_autoencoder", "masked_autoencoder_mobilevit",
)


def make_workload_objective(name: str, hp, steps_per_epoch=None, mesh=None):
    from avmnist_tpu.objectives.autoencoder import (
        AutoencoderConfig,
        make_autoencoder_objective,
    )
    from avmnist_tpu.objectives.infonce import InfoNCEConfig, make_infonce_objective
    from avmnist_tpu.objectives.simclr import SimCLRConfig, make_simclr_objective

    common = dict(learning_rate=hp.get("learning_rate", 1e-4),
                  num_epochs=hp.get("num_epochs", 100),
                  steps_per_epoch=steps_per_epoch)
    if name == "audio_simclr":
        return make_simclr_objective(SimCLRConfig(
            audio_only=True, output_dim=hp.get("output_dim", 256),
            projection_dim=hp.get("projection_dim", 128), **common), mesh=mesh)
    if name == "audio_simclr_mobilevit":
        return make_simclr_objective(SimCLRConfig(
            audio_only=True, audio_encoder_name="spectrogram_mobile_vit",
            output_dim=hp.get("output_dim", 256),
            projection_dim=hp.get("projection_dim", 128), **common), mesh=mesh)
    if name == "multimodal_simclr":
        return make_simclr_objective(SimCLRConfig(
            output_dim=hp.get("output_dim", 256),
            projection_dim=hp.get("projection_dim", 256), **common), mesh=mesh)
    if name == "info_nce":
        return make_infonce_objective(InfoNCEConfig(
            output_dim=hp.get("output_dim", 256),
            projection_dim=hp.get("projection_dim", 256), **common))
    variant = {"autoencoder": "plain", "masked_autoencoder": "masked",
               "masked_autoencoder_mobilevit": "masked_mobilevit"}[name]
    common["learning_rate"] = hp.get("learning_rate", 1e-3)
    return make_autoencoder_objective(AutoencoderConfig(
        variant=variant, output_dim=hp.get("output_dim", 256), **common))


def main(argv=None):
    from avmnist_tpu.config.schema import load_config, setup_jax, update_hardware_config
    from avmnist_tpu.parallel import create_mesh
    from avmnist_tpu.train.experiment import load_experiment_data
    from avmnist_tpu.train.ssl_experiment import (
        evaluate_multimodal_ssl,
        train_and_evaluate_ssl,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--workload", type=str, required=True, choices=WORKLOADS)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    parser.add_argument("--late_fusion", type=str, default=None,
                        choices=[None, "concat", "sum", "mean"])
    parser.add_argument("--synthetic_data", action="store_true")
    args = parser.parse_args(argv)

    setup_jax()
    config = update_hardware_config(load_config(args.config))
    hp = config["hyperparameters"]
    if args.synthetic_data:
        from avmnist_tpu.data.datasets import split_train_val
        from avmnist_tpu.data.synthetic import make_synthetic_avmnist

        train, test = make_synthetic_avmnist(n_train=512, n_test=128, seed=0)
        train_split, val_split = split_train_val(train, 448, 64, seed=1)
    else:
        train_split, val_split, test = load_experiment_data(config)
    mesh = create_mesh(n_model=config["hardware"].get("model_parallel", 1))
    steps = max(len(train_split) // hp["batch_size"], 1)

    out_dir = os.path.join(config["model"]["model_dir_data"], "other_ssl",
                           args.workload)
    os.makedirs(out_dir, exist_ok=True)
    result = train_and_evaluate_ssl(
        lambda: make_workload_objective(args.workload, hp, steps, mesh=mesh),
        config, train_split, val_split, test, out_dir, args.workload,
        epochs=args.epochs, mesh=mesh, seeds=tuple(args.seeds))
    print({k: v for k, v in result["accuracies"].items()})
    if args.late_fusion and args.workload in ("multimodal_simclr", "info_nce"):
        fusion_dir = os.path.join(out_dir, "late_fused")
        os.makedirs(fusion_dir, exist_ok=True)
        fused = evaluate_multimodal_ssl(
            result["objective"], result["init_state"], result["checkpoints"],
            train_split, val_split, test, fusion_dir, args.workload,
            fusion=args.late_fusion)
        print("late fusion:", fused)
    return result


if __name__ == "__main__":
    main()
