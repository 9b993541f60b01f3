"""Supervised workloads: CentralNet fusion + unimodal LeNets.

Reference: training_structures/centralnet_train.py (3-term CE loss :56-63, Adam
lr=1e-3 :14, batch 128 x 100 epochs from benchmarks.ipynb cells 7-8) and
training_structures/unimodal.py (CE + Adam + per-epoch cosine from models/unimodal.py:78-87).

TPU-native shape: one jitted step — normalize-on-device, bf16 compute (the AMP analog
of the reference's '16-mixed'), fp32 master params/optimizer, grads psum'd by XLA when
the batch is sharded over the mesh's data axis.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from avmnist_tpu.models.centralnet import CentralNet
from avmnist_tpu.models.lenet import CentralUnimodalAudio, CentralUnimodalImage
from avmnist_tpu.objectives.common import (
    Objective,
    cast_tree,
    cross_entropy,
    normalize_audio,
    normalize_images,
    per_step_rng,
)
from avmnist_tpu.train.optim import cosine_epoch_schedule, torch_adam
from avmnist_tpu.train.state import TrainState


def _apply_mixed(model, params, batch_stats, *inputs, train, rngs=None,
                 compute_dtype=jnp.bfloat16, method=None):
    """Apply with bf16 compute / fp32 master params; returns (out_fp32, new_stats)."""
    variables = {
        "params": cast_tree(params, compute_dtype),
        "batch_stats": cast_tree(batch_stats, compute_dtype),
    }
    inputs = tuple(x.astype(compute_dtype) for x in inputs)
    if train:
        out, updates = model.apply(variables, *inputs, train=True, rngs=rngs,
                                   mutable=["batch_stats"], method=method)
        new_stats = cast_tree(updates["batch_stats"], jnp.float32)
    else:
        out = model.apply(variables, *inputs, train=False, method=method)
        new_stats = batch_stats
    return jax.tree.map(lambda x: x.astype(jnp.float32), out), new_stats


def make_centralnet_objective(
    channels: int = 16,
    num_outputs: int = 10,
    fusingmix: str = "11,32,53",
    fusetype: str = "wsum",
    learning_rate: float = 1e-3,
    compute_dtype=jnp.bfloat16,
) -> Objective:
    model = CentralNet(channels=channels, num_outputs=num_outputs,
                       fusingmix=fusingmix, fusetype=fusetype)
    tx = torch_adam(learning_rate)

    def init_fn(rng) -> TrainState:
        variables = model.init(
            {"params": rng},
            jnp.zeros((1, 112, 112, 1)), jnp.zeros((1, 28, 28, 1)), train=False,
        )
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )

    @jax.jit
    def step_fn(state: TrainState, batch: Dict, rng) -> tuple:
        audio = normalize_audio(batch["audio"])
        image = normalize_images(batch["image"])
        label = batch["label"]

        def loss_fn(params):
            (a, i, f), new_stats = _apply_mixed(
                model, params, state.batch_stats, audio, image,
                train=True, compute_dtype=compute_dtype)
            loss = cross_entropy(a, label) + cross_entropy(i, label) + cross_entropy(f, label)
            return loss, (new_stats, f)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == label).astype(jnp.float32))
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state)
        return new_state, {"train_loss": loss, "train_acc": acc}

    @jax.jit
    def eval_fn(state: TrainState, batch: Dict) -> Dict:
        audio = normalize_audio(batch["audio"])
        image = normalize_images(batch["image"])
        (a, i, f), _ = _apply_mixed(model, state.params, state.batch_stats,
                                    audio, image, train=False,
                                    compute_dtype=compute_dtype)
        loss = (cross_entropy(a, batch["label"]) + cross_entropy(i, batch["label"])
                + cross_entropy(f, batch["label"]))
        return {"loss": loss, "logits": f,
                "correct_mask": (jnp.argmax(f, -1) == batch["label"])}

    return Objective("centralnet", init_fn, step_fn, eval_fn,
                     meta={"model": model, "learning_rate": learning_rate})


def make_unimodal_objective(
    modality: str = "image",  # modalnum 0 = image, 1 = audio (unimodal.py:14)
    num_classes: int = 10,
    learning_rate: float = 1e-3,
    num_epochs: int = 100,
    steps_per_epoch: Optional[int] = None,
    dropout_prob: float = 0.5,
    compute_dtype=jnp.bfloat16,
) -> Objective:
    """Supervised unimodal LeNet with head (UnimodalImage/Audio, unimodal.py:89-103);
    Adam + per-epoch CosineAnnealingLR (unimodal.py:78-87)."""
    if modality == "image":
        model = CentralUnimodalImage(with_head=True, dropout_prob=dropout_prob,
                                     num_classes=num_classes)
        shape = (1, 28, 28, 1)
    else:
        model = CentralUnimodalAudio(with_head=True, dropout_prob=dropout_prob,
                                     num_classes=num_classes)
        shape = (1, 112, 112, 1)
    lr = (cosine_epoch_schedule(learning_rate, num_epochs, steps_per_epoch)
          if steps_per_epoch else learning_rate)
    tx = torch_adam(lr)

    def pick(batch):
        return (normalize_images(batch["image"]) if modality == "image"
                else normalize_audio(batch["audio"]))

    def init_fn(rng) -> TrainState:
        variables = model.init({"params": rng}, jnp.zeros(shape), train=False)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )

    @jax.jit
    def step_fn(state: TrainState, batch: Dict, rng) -> tuple:
        rng = per_step_rng(rng, state)  # REQUIRED contract: per-step stream from the per-epoch key (objectives.common)
        x, label = pick(batch), batch["label"]

        def loss_fn(params):
            logits, new_stats = _apply_mixed(
                model, params, state.batch_stats, x, train=True,
                rngs={"dropout": rng}, compute_dtype=compute_dtype)
            return cross_entropy(logits, label), (new_stats, logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == label).astype(jnp.float32))
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state)
        return new_state, {"train_loss": loss, "train_acc": acc}

    @jax.jit
    def eval_fn(state: TrainState, batch: Dict) -> Dict:
        logits, _ = _apply_mixed(model, state.params, state.batch_stats, pick(batch),
                                 train=False, compute_dtype=compute_dtype)
        return {"loss": cross_entropy(logits, batch["label"]), "logits": logits,
                "correct_mask": (jnp.argmax(logits, -1) == batch["label"])}

    return Objective(f"unimodal_{modality}", init_fn, step_fn, eval_fn,
                     meta={"model": model, "learning_rate": learning_rate})
