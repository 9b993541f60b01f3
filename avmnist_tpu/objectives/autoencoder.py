"""Audio (masked) autoencoder objectives (reference other_ssl/autoencoder/
autoencoder.ipynb cells 4-12).

- Plain: MSE(recon, x) on the full spectrogram (cell 11), Adam lr=1e-3.
- Masked: grouped 4x4-patch masking at mask_ratio (0.75 default), loss
  ``mse(recon * mask, x * mask)`` where mask==0 at the MASKED groups — i.e. the loss
  lands on the VISIBLE region, a reference code/comment mismatch preserved for parity
  (loss_on='masked' gives the corrected variant).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from avmnist_tpu.augment.functional import grouped_mask_batch
from avmnist_tpu.models.autoencoder import (
    ConvAutoencoder,
    MaskedConvAutoencoder,
    MobileVitMaskedAutoencoder,
)
from avmnist_tpu.objectives.common import Objective, cast_tree, normalize_audio, per_step_rng
from avmnist_tpu.train.optim import cosine_epoch_schedule, torch_adam
from avmnist_tpu.train.state import TrainState


@dataclasses.dataclass
class AutoencoderConfig:
    variant: str = "plain"  # plain | masked | masked_mobilevit
    output_dim: int = 256
    mask_ratio: float = 0.75
    loss_on: str = "visible"  # reference behavior; 'masked' = corrected MAE loss
    learning_rate: float = 1e-3
    num_epochs: int = 100
    steps_per_epoch: Optional[int] = None
    audio_mean: float = 0.0
    audio_std: float = 1.0
    compute_dtype: Any = jnp.bfloat16
    # jax.checkpoint on the forward (HBM-bound step: trade stored-activation
    # traffic for MXU recompute; identical up to float reassociation — see
    # DinoConfig.remat_student). Default off until measured on the chip.
    remat: bool = False


def make_autoencoder_objective(cfg: AutoencoderConfig) -> Objective:
    model = {
        "plain": lambda: ConvAutoencoder(output_dim=cfg.output_dim),
        "masked": lambda: MaskedConvAutoencoder(output_dim=cfg.output_dim),
        "masked_mobilevit": lambda: MobileVitMaskedAutoencoder(output_dim=cfg.output_dim),
    }[cfg.variant]()
    masked = cfg.variant != "plain"
    lr = (cosine_epoch_schedule(cfg.learning_rate, cfg.num_epochs, cfg.steps_per_epoch)
          if cfg.steps_per_epoch else cfg.learning_rate)
    tx = torch_adam(lr)
    aud0 = jnp.zeros((2, 112, 112, 1))

    def init_fn(rng) -> TrainState:
        variables = model.init({"params": rng, "dropout": rng}, aud0, train=False)
        return TrainState(step=jnp.zeros((), jnp.int32),
                          params=variables["params"],
                          batch_stats=variables.get("batch_stats", {}),
                          opt_state=tx.init(variables["params"]))

    @jax.jit
    def step_fn(state: TrainState, batch: Dict, rng) -> tuple:
        rng = per_step_rng(rng, state)  # REQUIRED contract: per-step stream from the per-epoch key (objectives.common)
        k_mask, k_drop = jax.random.split(rng)
        x = normalize_audio(batch["audio"], cfg.audio_mean, cfg.audio_std)
        if masked:
            keep = grouped_mask_batch(k_mask, x.shape[:3], cfg.mask_ratio)[..., None]
            model_in = x * keep
            loss_mask = keep if cfg.loss_on == "visible" else (1.0 - keep)
        else:
            model_in = x
            loss_mask = jnp.ones_like(x)

        def fwd(params, model_in_):
            variables = {"params": cast_tree(params, cfg.compute_dtype),
                         "batch_stats": cast_tree(state.batch_stats, cfg.compute_dtype)}
            (recon, latent), upd = model.apply(
                variables, model_in_.astype(cfg.compute_dtype), train=True,
                rngs={"dropout": k_drop}, mutable=["batch_stats"])
            return recon, upd

        if cfg.remat:
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            recon, upd = fwd(params, model_in)
            recon = recon.astype(jnp.float32)
            loss = jnp.mean((recon * loss_mask - x * loss_mask) ** 2)
            return loss, cast_tree(upd["batch_stats"], jnp.float32)

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state)
        return new_state, {"train_loss": loss}

    @jax.jit
    def feature_fn(state: TrainState, batch: Dict) -> jnp.ndarray:
        """Latent features for probes (EncoderWrapper analog, autoencoder.ipynb cell 9):
        the probe sees the UN-masked spectrogram through the frozen encoder."""
        x = normalize_audio(batch["audio"], cfg.audio_mean, cfg.audio_std)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        _, latent = model.apply(variables, x, train=False)
        return latent

    return Objective(f"autoencoder_{cfg.variant}", init_fn, step_fn,
                     feature_fn=feature_fn,
                     meta={"config": cfg, "net": model,
                           "feature_fns": {"audio": feature_fn}})
