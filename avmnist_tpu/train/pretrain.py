"""Imperative (non-Lightning-style) pretrain loop — reference
training_structures/dino_train.py:104-186 artifact parity: timestamped save/log
paths, CSV log whose header embeds JSON metadata, best-train-loss checkpointing of
{step, state (params+opt+teacher+center), loss}.

Functionally the generic ``train.loops.fit`` covers this; this wrapper exists for the
reference's exact artifact/file contract."""
from __future__ import annotations

import os
from datetime import datetime
from typing import Dict, Optional

import jax

from avmnist_tpu.data.datasets import Batches
from avmnist_tpu.objectives.common import Objective
from avmnist_tpu.train.checkpoint import save_checkpoint
from avmnist_tpu.train.loops import run_epoch
from avmnist_tpu.utils.logging import MetadataCSV


def pretrain(
    objective: Objective,
    train_data,
    num_epochs: int = 100,
    batch_size: int = 128,
    learning_rate: float = 1e-4,
    save_path: str = "pretrained_dino",
    log_path: str = "pretrain_log.csv",
    seed: int = 1,
    mesh=None,
    state=None,
) -> tuple:
    """Train with per-epoch CSV logging + best-loss checkpoint. Returns (state, path)."""
    stamp = datetime.now().strftime("%Y-%m-%d %H-%M-%S")
    save_path = f"{save_path}_{stamp}"
    log_path = log_path.replace(".csv", f"_{stamp}.csv")
    log = MetadataCSV(log_path, ["epoch", "train_loss"], {
        "start_time": datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
        "learning_rate": learning_rate,
        "batch_size": batch_size,
        "epochs": num_epochs,
        "model_name": objective.name,
    })
    rng = jax.random.key(seed)
    if state is None:
        rng, k = jax.random.split(rng)
        state = objective.init_fn(k)
    batches = Batches(train_data, batch_size=batch_size, shuffle=True, seed=seed)
    best_loss = float("inf")
    for epoch in range(num_epochs):
        state, metrics, rng = run_epoch(objective, state, batches, rng, mesh)
        log.append([epoch + 1, metrics["train_loss"]])
        if metrics["train_loss"] < best_loss:
            best_loss = metrics["train_loss"]
            save_checkpoint(save_path, state, extra={"epoch": epoch,
                                                     "loss": best_loss})
    return state, save_path
