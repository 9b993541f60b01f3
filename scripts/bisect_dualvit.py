"""Bisect the multi_dual_vit DINO divergence (round-2 VERDICT Weak #1).

Short training runs on a train subset, toggling one suspect at a time:

    python scripts/bisect_dualvit.py --tag baseline            # bf16 (round-2 default)
    python scripts/bisect_dualvit.py --tag f32                 # f32 compute_dtype
    AVMNIST_MAX_SCAN_STEPS=64 python scripts/bisect_dualvit.py --tag seg64
    python scripts/bisect_dualvit.py --tag lowlr --lr 3e-5

Prints one JSON line per epoch: dino_loss, grad_norm, teacher_entropy, mlp_acc.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--n_train", type=int, default=12800)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--probe_every", type=int, default=2)
    ap.add_argument("--model", default="multi_dual_vit")
    ap.add_argument("--dropout0", action="store_true",
                    help="zero out ViT/projection dropout")
    ap.add_argument("--per_view_bn", action="store_true",
                    help="exact reference per-view BN statistics")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--config", default="configs/config_parity_synth.yaml")
    args = ap.parse_args()

    from avmnist_tpu.config.schema import load_config
    from avmnist_tpu.cli.run_dino import dino_config_from_yaml
    from avmnist_tpu.data.datasets import DataSplit
    from avmnist_tpu.data.resident import as_resident
    from avmnist_tpu.objectives.dino import make_dino_objective
    from avmnist_tpu.train.experiment import load_experiment_data, make_mlp_probe_hook
    from avmnist_tpu.train.loops import fit

    config = load_config(args.config)
    train_split, val_split, _ = load_experiment_data(config)
    # subset for fast bisection
    sub = DataSplit(train_split.arrays, train_split.indices[: args.n_train])
    vsub = DataSplit(val_split.arrays, val_split.indices[:2000])

    steps = args.n_train // args.batch_size
    dcfg = dino_config_from_yaml(config, args.model, "default", steps)
    dcfg = dataclasses.replace(
        dcfg,
        learning_rate=args.lr,
        num_epochs=args.epochs,
        compute_dtype=jnp.float32 if args.dtype == "f32" else jnp.bfloat16,
        per_view_bn=args.per_view_bn,
        **({"dropout": 0.0,
            "encoder_kwargs": {"vit_dropout": 0.0}} if args.dropout0 else {}),
    )
    obj = make_dino_objective(dcfg)
    train_res = as_resident(sub)
    probe = make_mlp_probe_hook(obj, sub, vsub, learning_rate=dcfg.learning_rate,
                                probe_bn_mode="train")

    def on_epoch_end(epoch, state, metrics):
        extra = {}
        if (epoch + 1) % args.probe_every == 0 or epoch == args.epochs - 1:
            extra = probe(epoch, state, metrics)
        row = {"tag": args.tag, "epoch": epoch,
               **{k: round(float(v), 4) for k, v in {**metrics, **extra}.items()
                  if isinstance(v, (int, float, np.floating))}}
        print(json.dumps(row), flush=True)
        return extra

    t0 = time.time()
    fit(obj, train_res, epochs=args.epochs, batch_size=args.batch_size,
        seed=args.seed, on_epoch_end=on_epoch_end)
    print(json.dumps({"tag": args.tag, "done": True,
                      "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
