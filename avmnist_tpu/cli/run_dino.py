"""run_dino CLI — flag-for-flag compatible with the reference (run_dino.py:558-676):

    python run_dino.py --model multi_central --config config_multimodal_dino.yaml \
        --metric mlp_acc --training_mode default [--hyperparameter_tune] \
        [--hyperparameter_tune_augments]

plus TPU-era additions: --epochs/--seeds overrides and --synthetic_data for hermetic
smoke runs. Run-dir layout: {model_dir_scratch|data}/{model}[_{mode}]_{metric}_{ts}/
with the config copied (and mutated by tuning) into the scratch dir.
"""
from __future__ import annotations

import argparse
import os
import shutil
from datetime import datetime
from typing import Dict, Optional

from avmnist_tpu.config.schema import (load_config, save_config, setup_jax,
                                        update_hardware_config)
from avmnist_tpu.models.registry import MODEL_MAP, UNIMODAL_MODEL_MAP

TRAINING_MODES = ("default", "semi_supervised", "mse", "infonce")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="AVMNIST-TPU DINO pretraining")
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--model", type=str, choices=sorted(MODEL_MAP))
    group.add_argument("--unimodal_model", type=str, choices=sorted(UNIMODAL_MODEL_MAP))
    parser.add_argument("--training_mode", type=str, default="default",
                        choices=TRAINING_MODES)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--metric", type=str, default="mlp_acc",
                        choices=["mlp_acc", "train_loss"])
    parser.add_argument("--hyperparameter_tune", action="store_true")
    parser.add_argument("--hyperparameter_tune_augments", action="store_true")
    # TPU-framework additions (default behavior identical to reference)
    parser.add_argument("--epochs", type=int, default=None, help="override num_epochs")
    parser.add_argument("--seeds", type=int, nargs="+", default=None)
    parser.add_argument("--synthetic_data", action="store_true",
                        help="run on generated synthetic data (smoke testing)")
    return parser


def dino_config_from_yaml(config: Dict, model_name: str, mode: str,
                          train_steps_per_epoch: Optional[int] = None):
    from avmnist_tpu.objectives.dino import DinoConfig

    hp = config["hyperparameters"]
    rf = config.get("reference_faithful", {})
    from avmnist_tpu.tuning.spaces import process_augment_config

    best_augments = None
    if config.get("best_augments"):
        best_augments = process_augment_config(None, config,
                                               is_hyperparameter_search=False)
    return DinoConfig(
        model_name=model_name,
        mode=mode,
        projection_dim=hp["projection_dim"],
        output_dim=hp["output_dim"],
        encoder_output_dim=hp["encoder_output_dim"],
        momentum=hp["momentum"],
        center_momentum=hp["center_momentum"],
        student_temperature=hp["student_temperature"],
        teacher_temperature=hp["teacher_temperature"],
        learning_rate=hp["learning_rate"],
        weight_decay=hp["weight_decay"],
        dropout=hp["dropout"],
        num_epochs=hp["num_epochs"],
        steps_per_epoch=train_steps_per_epoch,
        n_global_views=hp.get("n_global_views", 2),
        n_local_views=hp.get("n_local_views", 4),
        best_augments=best_augments,
        alpha=hp.get("alpha", 1.0),
        cosine_loss_alpha=hp.get("cosine_loss_alpha", 0.0),
        lr_warmup_epochs=hp.get("lr_warmup_epochs", 0),
        num_classes=config["model"].get("num_classes", 10),
        compute_dtype=_compute_dtype(hp),
        # quirk switches (schema reference_faithful block; defaults faithful)
        l2_normalize_before_softmax=rf.get("l2_normalize_before_softmax", True),
        unimodal_double_centering=rf.get("unimodal_double_centering", True),
        teacher_ema_before_optimizer=rf.get("teacher_ema_before_optimizer", True),
    )


def _compute_dtype(hp: Dict):
    """bf16 by default; `AVMNIST_COMPUTE_DTYPE=float32` (or hyperparameters:
    compute_dtype in the YAML) forces full-f32 steps — the precision-ablation
    switch used to bisect ViT DINO training stability."""
    import jax.numpy as jnp

    name = os.environ.get("AVMNIST_COMPUTE_DTYPE",
                          hp.get("compute_dtype", "bfloat16"))
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def main(argv=None):
    import jax

    from avmnist_tpu.data.synthetic import make_synthetic_avmnist
    from avmnist_tpu.objectives.dino import make_dino_objective
    from avmnist_tpu.parallel import create_mesh
    from avmnist_tpu.train.experiment import (
        load_experiment_data,
        run_seeds,
        summarize_experiment,
    )
    from avmnist_tpu.utils.reproducibility import set_seed

    args = build_parser().parse_args(argv)
    if args.unimodal_model and args.training_mode != "default":
        raise ValueError("--training_mode is only compatible with --model")

    chosen = args.model or args.unimodal_model
    # Reference resolves bare config names under a configs/ dir (run_dino.py:595);
    # accept either a path or a name.
    config_arg = args.config
    if not os.path.exists(config_arg):
        candidate = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "configs", config_arg)
        if os.path.exists(candidate):
            config_arg = candidate
        else:
            raise FileNotFoundError(f"config not found: {args.config}")
    args.config = config_arg
    setup_jax()
    config = update_hardware_config(load_config(args.config))

    mode_suffix = f"_{args.training_mode}" if args.training_mode != "default" else ""
    timestamp = datetime.now().strftime("%d%m%Y_%H%M%S")
    # AVMNIST_RUN_NAME pins the run-dir name so a re-invocation lands in the same
    # directory and RESUMES its Optuna study (same optuna_studies.db —
    # load_if_exists + remaining-trials, reference run_dino.py:149-162 semantics
    # across process restarts).
    model_name = (os.environ.get("AVMNIST_RUN_NAME")
                  or f"{chosen}{mode_suffix}_{args.metric}_{timestamp}")
    model_dir_scratch = os.path.join(config["model"]["model_dir_scratch"], model_name)
    model_dir_data = os.path.join(config["model"]["model_dir_data"], model_name)
    # scratch is created now (the config copy lands there); the data dir is
    # created by summarize_experiment only when artifacts exist, so an aborted
    # run leaves no empty data dir behind (VERDICT r2).
    os.makedirs(model_dir_scratch, exist_ok=True)
    config_path = os.path.join(model_dir_scratch, "config.yaml")
    if os.path.exists(args.config):
        shutil.copy(args.config, config_path)
    else:
        save_config(config, config_path)
    config["model"]["name"] = chosen
    config["hyperparameters"]["metric"] = args.metric
    if args.epochs:
        config["hyperparameters"]["num_epochs"] = args.epochs
    set_seed(config["experiment"].get("seed", 1))

    # data
    if args.synthetic_data:
        from avmnist_tpu.data.datasets import split_train_val

        train, test = make_synthetic_avmnist(n_train=256, n_test=64, seed=0)
        train_split, val_split = split_train_val(train, 224, 32, seed=1)
    else:
        train_split, val_split, test = load_experiment_data(config)

    hp = config["hyperparameters"]
    steps_per_epoch = len(train_split) // hp["batch_size"]
    mesh = create_mesh(n_model=config["hardware"].get("model_parallel", 1))
    if config.get("data", {}).get("resident", True):
        # One HBM placement up front; tuning trials and the seed loop then run
        # whole-epoch scans with no per-batch H2D (data/resident.py).
        from avmnist_tpu.data.resident import as_resident

        train_split = as_resident(train_split, mesh)
        val_split = as_resident(val_split, mesh)
        test = as_resident(test, mesh)

    def make_objective(overrides: Optional[Dict] = None, augments=None):
        merged = dict(config)
        if overrides:
            merged = dict(config)
            merged["hyperparameters"] = {**hp, **overrides}
        dcfg = dino_config_from_yaml(merged, chosen, args.training_mode,
                                     steps_per_epoch)
        if augments is not None:
            import dataclasses

            dcfg = dataclasses.replace(dcfg, best_augments=augments)
        return make_dino_objective(dcfg, mesh=mesh)

    def trial_train(overrides_or_augments, trial, is_augment=False):
        """Short training for one tuning trial (objective_dino.py: epochs_per_trial,
        early stopping patience 5 on the metric)."""
        from avmnist_tpu.train.experiment import make_mlp_probe_hook
        from avmnist_tpu.train.loops import fit

        obj = (make_objective(augments=overrides_or_augments) if is_augment
               else make_objective(overrides=overrides_or_augments))
        hook = make_mlp_probe_hook(obj, train_split, val_split,
                                   learning_rate=hp["learning_rate"])
        best, patience, mode = None, 0, ("max" if args.metric == "mlp_acc" else "min")
        history_metric = []

        def on_epoch_end(epoch, st, metrics):
            extra = hook(epoch, st, metrics)
            value = {**metrics, **extra}.get(args.metric)
            history_metric.append(value)
            return extra

        epochs = int(config.get("optuna", {}).get("epochs_per_trial", 10))
        fit(obj, train_split, epochs=epochs,
            batch_size=(overrides_or_augments or {}).get("batch_size", hp["batch_size"])
            if not is_augment else hp["batch_size"],
            seed=1, mesh=mesh, on_epoch_end=on_epoch_end)
        vals = [v for v in history_metric if v is not None]
        if not vals:
            return float("nan")
        return max(vals) if mode == "max" else min(vals)

    study = None
    if args.hyperparameter_tune:
        from avmnist_tpu.tuning import search_hyperparameters

        study = search_hyperparameters(
            config, lambda hparams, trial: trial_train(hparams, trial),
            model_dir_scratch, config_path)
    if args.hyperparameter_tune_augments:
        from avmnist_tpu.tuning import search_augmentation_hyperparameters

        study = search_augmentation_hyperparameters(
            config, lambda aug, trial: trial_train(aug, trial, is_augment=True),
            model_dir_scratch, config_path)

    if study is not None:
        # Optuna study plot suite (reference run_dino.py:478-479 ->
        # plots_trials.py:426-439): trial values + parallel coords + importances.
        from avmnist_tpu.eval.visualize import create_plots_for_study

        create_plots_for_study(study, os.path.join(model_dir_data, "plots_trials"))

    results = run_seeds(
        make_objective, config, train_split, val_split, test,
        model_dir_scratch, model_name, metric=args.metric,
        mesh=mesh, seeds=tuple(args.seeds or config["experiment"].get("seeds", (1, 2, 3))))

    objective = make_objective()
    augment_dump = objective.meta["augment"].describe()
    extra = dict(results[-1].gates or {})  # learned gates from the last seed
    row = summarize_experiment(results, config, model_dir_data, model_name,
                               extra_summary=extra, augment_dump=augment_dump)
    print(f"kNN Accuracy: {row['downstream_knn_accuracy']:.2f} "
          f"± {row['downstream_knn_accuracy_std']:.2f}")
    print(f"MLP Accuracy: {row['downstream_mlp_acc']:.2f} "
          f"± {row['downstream_mlp_acc_std']:.2f}")
    return row


if __name__ == "__main__":
    main()
