"""Supervised benchmarks CLI — the reference's benchmarks.ipynb as a script:
CentralNet fusion + unimodal image/audio LeNets, seeds {1,2,3}, test accuracy
mean±std written to accuracy_summary.txt (cells 7-19 + training_structures/
centralnet_train.py / unimodal.py)."""
from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np


def run_supervised(model_type: str, config: Dict, train_split, val_split, test,
                   out_root: str, mesh=None, epochs=None, seeds=(1, 2, 3)) -> Dict:
    import jax

    from avmnist_tpu.data.datasets import Batches
    from avmnist_tpu.objectives.supervised import (
        make_centralnet_objective,
        make_unimodal_objective,
    )
    from avmnist_tpu.eval.metrics import write_prediction_csv
    from avmnist_tpu.train.loops import evaluate, fit
    from avmnist_tpu.utils.logging import MetadataCSV
    from avmnist_tpu.utils.reproducibility import set_seed

    hp = config["hyperparameters"]
    epochs = epochs or hp.get("num_epochs", 100)
    lr = hp.get("learning_rate", 1e-3)
    steps = max(len(train_split) // hp["batch_size"], 1)
    out_dir = os.path.join(out_root, model_type)
    os.makedirs(out_dir, exist_ok=True)

    accs = []
    for seed in seeds:
        set_seed(seed)
        if model_type == "centralnet":
            obj = make_centralnet_objective(learning_rate=lr)
        else:
            obj = make_unimodal_objective(model_type, learning_rate=lr,
                                          num_epochs=epochs, steps_per_epoch=steps)
        log = MetadataCSV(
            os.path.join(out_dir, f"training_log_{model_type}_seed_{seed}.csv"),
            ["epoch", "train_loss", "val_loss", "val_accuracy"],
            {"learning_rate": lr, "batch_size": hp["batch_size"], "epochs": epochs,
             "optimizer": "Adam", "model_name": model_type})

        def on_epoch_end(epoch, st, metrics):
            log.append([epoch + 1, metrics.get("train_loss"),
                        metrics.get("val_loss"), metrics.get("val_accuracy")])
            return {}

        state, _ = fit(obj, train_split, epochs=epochs, batch_size=hp["batch_size"],
                       seed=seed, mesh=mesh, val_data=val_split,
                       on_epoch_end=on_epoch_end)
        from avmnist_tpu.data.resident import ResidentSplit
        from avmnist_tpu.train.loops import evaluate_resident

        if isinstance(test, ResidentSplit):
            result = evaluate_resident(obj, state, test, hp["batch_size"], mesh)
        else:
            result = evaluate(obj, state,
                              Batches(test, hp["batch_size"], shuffle=False,
                                      pad_final=True), mesh)
        write_prediction_csv(
            os.path.join(out_dir, f"test_results_{model_type}_seed_{seed}.csv"),
            result["labels"], result["preds"], result["probs"])
        accs.append(result["accuracy"])
        print(f"{model_type} seed {seed}: test acc {result['accuracy']:.2f}%")

    summary = os.path.join(out_dir, "accuracy_summary.txt")
    with open(summary, "w") as f:
        f.write(f"Mean Test Accuracy over {len(seeds)} seeds: {np.mean(accs):.4f}\n")
        f.write(f"Std Dev of Accuracy: {np.std(accs):.4f}\n")
    return {"mean": float(np.mean(accs)), "std": float(np.std(accs)), "accs": accs}


def main(argv=None):
    from avmnist_tpu.config.schema import load_config, setup_jax, update_hardware_config
    from avmnist_tpu.parallel import create_mesh
    from avmnist_tpu.train.experiment import load_experiment_data

    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="+", default=["centralnet", "image", "audio"],
                        choices=["centralnet", "image", "audio"])
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    parser.add_argument("--synthetic_data", action="store_true")
    args = parser.parse_args(argv)

    setup_jax()
    config = update_hardware_config(load_config(args.config))
    if args.synthetic_data:
        from avmnist_tpu.data.datasets import split_train_val
        from avmnist_tpu.data.synthetic import make_synthetic_avmnist

        train, test = make_synthetic_avmnist(n_train=512, n_test=128, seed=0)
        train_split, val_split = split_train_val(train, 448, 64, seed=1)
    else:
        train_split, val_split, test = load_experiment_data(config)
    mesh = create_mesh(n_model=config["hardware"].get("model_parallel", 1))
    if config.get("data", {}).get("resident", True):
        from avmnist_tpu.data.resident import as_resident

        train_split = as_resident(train_split, mesh)
        val_split = as_resident(val_split, mesh)
        test = as_resident(test, mesh)
    out_root = os.path.join(config["model"]["model_dir_data"], "supervised_results")
    results = {}
    for m in args.models:
        results[m] = run_supervised(m, config, train_split, val_split, test,
                                    out_root, mesh, args.epochs, tuple(args.seeds))
    return results


if __name__ == "__main__":
    main()
