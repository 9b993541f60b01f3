"""Multimodal InfoNCE objective (reference other_ssl/info_nce/info_nce.py:14-143).

Un-augmented (image, audio) pairs -> per-modality encoder + projection head ->
symmetric InfoNCE @ 0.07. With the batch sharded over the data axis the B x B
similarity matrix spans the global batch — all-gathered negatives over ICI.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from avmnist_tpu.models.encoders import ImageEncoder, SpectrogramEncoder
from avmnist_tpu.models.layers import ProjectionHead
from avmnist_tpu.objectives.common import (
    Objective,
    cast_tree,
    normalize_audio,
    normalize_images,
    per_step_rng,
)
from avmnist_tpu.objectives.dino import infonce_loss_fn
from avmnist_tpu.train.optim import cosine_epoch_schedule, torch_adam
from avmnist_tpu.train.state import TrainState


class _InfoNCENet(nn.Module):
    output_dim: int = 256
    projection_dim: int = 256

    def setup(self):
        self.image_encoder = ImageEncoder(output_dim=self.output_dim)
        self.audio_encoder = SpectrogramEncoder(output_dim=self.output_dim)
        self.image_projection_head = ProjectionHead(self.projection_dim)
        self.audio_projection_head = ProjectionHead(self.projection_dim)

    def __call__(self, images, spectrograms, train: bool = True):
        f_i = self.image_encoder(images=images, spectrograms=None, train=train)
        f_a = self.audio_encoder(images=None, spectrograms=spectrograms, train=train)
        return (self.image_projection_head(f_i, train=train),
                self.audio_projection_head(f_a, train=train))

    def image_features(self, images, train: bool = False):
        return self.image_encoder(images=images, spectrograms=None, train=train)

    def audio_features(self, spectrograms, train: bool = False):
        return self.audio_encoder(images=None, spectrograms=spectrograms, train=train)


@dataclasses.dataclass
class InfoNCEConfig:
    output_dim: int = 256
    projection_dim: int = 256
    learning_rate: float = 1e-4
    num_epochs: int = 100
    steps_per_epoch: Optional[int] = None
    temperature: float = 0.07
    audio_mean: float = 0.0
    audio_std: float = 1.0
    compute_dtype: Any = jnp.bfloat16


def make_infonce_objective(cfg: InfoNCEConfig) -> Objective:
    net = _InfoNCENet(output_dim=cfg.output_dim, projection_dim=cfg.projection_dim)
    lr = (cosine_epoch_schedule(cfg.learning_rate, cfg.num_epochs, cfg.steps_per_epoch)
          if cfg.steps_per_epoch else cfg.learning_rate)
    tx = torch_adam(lr)

    def init_fn(rng) -> TrainState:
        variables = net.init({"params": rng, "dropout": rng},
                             jnp.zeros((2, 28, 28, 1)), jnp.zeros((2, 112, 112, 1)),
                             train=False)
        return TrainState(step=jnp.zeros((), jnp.int32),
                          params=variables["params"],
                          batch_stats=variables.get("batch_stats", {}),
                          opt_state=tx.init(variables["params"]))

    @jax.jit
    def step_fn(state: TrainState, batch: Dict, rng) -> tuple:
        rng = per_step_rng(rng, state)  # REQUIRED contract: per-step stream from the per-epoch key (objectives.common)
        images = normalize_images(batch["image"])
        audios = normalize_audio(batch["audio"], cfg.audio_mean, cfg.audio_std)

        def loss_fn(params):
            variables = {"params": cast_tree(params, cfg.compute_dtype),
                         "batch_stats": cast_tree(state.batch_stats, cfg.compute_dtype)}
            (zi, za), upd = net.apply(
                variables, images.astype(cfg.compute_dtype),
                audios.astype(cfg.compute_dtype), train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            loss = infonce_loss_fn(zi.astype(jnp.float32), za.astype(jnp.float32),
                                   cfg.temperature)
            return loss, cast_tree(upd["batch_stats"], jnp.float32)

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state)
        return new_state, {"train_loss": loss}

    def _feature(method):
        @jax.jit
        def fn(state: TrainState, batch: Dict) -> jnp.ndarray:
            x = (normalize_images(batch["image"]) if method == "image_features"
                 else normalize_audio(batch["audio"], cfg.audio_mean, cfg.audio_std))
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            return net.apply(variables, x, train=False, method=method)
        return fn

    feature_fns = {"image": _feature("image_features"),
                   "audio": _feature("audio_features")}
    return Objective("info_nce", init_fn, step_fn, feature_fn=feature_fns["audio"],
                     meta={"config": cfg, "net": net, "feature_fns": feature_fns})
