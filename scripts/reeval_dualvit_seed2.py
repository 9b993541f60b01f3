"""Recompute kNN + MLP probes for the dual-ViT canonical seed-2 best
checkpoint (the r5 run's aggregation step was cut to free the chip for the
perf phase; the downstream MLP test log exists, kNN does not — this fills it
from the committed best checkpoint via the reevaluate harness)."""
from __future__ import annotations

import json
import sys

import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from avmnist_tpu.cli.run_dino import dino_config_from_yaml
from avmnist_tpu.config.schema import load_config
from avmnist_tpu.eval.reevaluate import evaluate_models
from avmnist_tpu.objectives.dino import make_dino_objective
from avmnist_tpu.train.experiment import load_experiment_data

RUN = "runs/parity/scratch/dualvit_canonical_s23_r5"


def main():
    config = load_config("configs/config_parity_synth_dualvit_canonical.yaml")
    train_split, val_split, test = load_experiment_data(config)
    # steps_per_epoch must match the run (it selects the LR schedule, which
    # shapes the optax state the checkpoint was saved with)
    spe = len(train_split) // config["hyperparameters"]["batch_size"]
    cfg = dino_config_from_yaml(config, "multi_dual_vit", "default", spe)
    obj = make_dino_objective(cfg)
    template = obj.init_fn(jax.random.key(0))
    res = evaluate_models(obj, template, RUN, train_split, val_split, test)
    print(json.dumps({str(k): v for k, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
