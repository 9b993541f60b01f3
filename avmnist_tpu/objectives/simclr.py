"""SimCLR objectives: audio-only NT-Xent + multimodal random-mode NT-Xent.

Reference: archive/audio_simclr.py:12-96 (the authoritative copy — the live notebooks
import an uncommitted local module, SURVEY.md §2c) and
other_ssl/multimodal_simclr/multimodal_simclr.py:12-112.

TPU-native: the two-view augmentation bank runs inside the jitted step; with the batch
sharded over the mesh's data axis the 2B x 2B NT-Xent similarity matrix is formed on
the GLOBAL batch — i.e. negatives are all-gathered over ICI (XLA materializes the
all-gather on the (B, P) projections, never the pixels). The multimodal variant's
per-batch random mode (img-img / aud-aud / img-aud / aud-img) is a ``lax.switch`` —
one branch executes per step, as in the reference.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from avmnist_tpu.augment.simclr import SimCLRAugment
from avmnist_tpu.models.encoders import ImageEncoder, SpectrogramEncoder, SpectrogramEncoderMobileViT
from avmnist_tpu.models.layers import ProjectionHead
from avmnist_tpu.objectives.common import (
    Objective,
    anchor_data_sharding,
    cast_tree,
    normalize_audio,
    normalize_images,
    per_step_rng,
    shard_map_augment,
)
from avmnist_tpu.train.optim import cosine_epoch_schedule, torch_adam
from avmnist_tpu.train.state import TrainState


def _pallas_ntxent_enabled() -> bool:
    """Route the NT-Xent logits through ops.pallas_ntxent (fused normalize +
    MXU similarity + diag mask; measured 1.10x vs the XLA chain on v5e, with an
    analytic XLA backward). Default ON on TPU; ``AVMNIST_PALLAS_NTXENT``
    overrides; interpret-mode (exact) off-TPU."""
    import os

    default = "1" if jax.default_backend() == "tpu" else "0"
    return os.environ.get("AVMNIST_PALLAS_NTXENT", default).lower() in (
        "1", "true", "on")


def nt_xent_loss(z1: jnp.ndarray, z2: jnp.ndarray, temperature: float = 0.07) -> jnp.ndarray:
    """NT-Xent exactly as the reference (audio_simclr.py:56-72): normalize, 2Bx2B
    similarity, -inf diagonal, positives at (i, i+B) / (i+B, i)."""
    reps = jnp.concatenate([z1, z2], axis=0)
    n = reps.shape[0]
    b = n // 2
    labels = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    if _pallas_ntxent_enabled():
        from avmnist_tpu.ops.pallas_ntxent import nt_xent_logits

        sim = nt_xent_logits(reps, temperature)
        return optax.softmax_cross_entropy_with_integer_labels(sim, labels).mean()
    reps = reps / (jnp.linalg.norm(reps, axis=1, keepdims=True) + 1e-12)
    sim = (reps @ reps.T) / temperature
    sim = jnp.where(jnp.eye(n, dtype=bool), -jnp.inf, sim)
    return optax.softmax_cross_entropy_with_integer_labels(sim, labels).mean()


class _SimCLRNet(nn.Module):
    """Encoders + projection heads; methods select the (encoder, head) pair."""

    output_dim: int = 256
    projection_dim: int = 256
    audio_only: bool = False
    audio_encoder_name: str = "spectrogram_simple"

    def setup(self):
        if not self.audio_only:
            self.image_encoder = ImageEncoder(output_dim=self.output_dim)
            self.image_projection_head = ProjectionHead(self.projection_dim)
        enc = {"spectrogram_simple": SpectrogramEncoder,
               "spectrogram_mobile_vit": SpectrogramEncoderMobileViT}[self.audio_encoder_name]
        self.audio_encoder = enc(output_dim=self.output_dim)
        self.audio_projection_head = ProjectionHead(self.projection_dim)

    def embed_image(self, images, train: bool = True):
        f = self.image_encoder(images=images, spectrograms=None, train=train)
        return self.image_projection_head(f, train=train)

    def embed_audio(self, spectrograms, train: bool = True):
        f = self.audio_encoder(images=None, spectrograms=spectrograms, train=train)
        return self.audio_projection_head(f, train=train)

    def image_features(self, images, train: bool = False):
        return self.image_encoder(images=images, spectrograms=None, train=train)

    def audio_features(self, spectrograms, train: bool = False):
        return self.audio_encoder(images=None, spectrograms=spectrograms, train=train)

    def __call__(self, img1, aud1, img2, aud2, mode, train: bool = True):
        """mode: 0 img-img, 1 aud-aud, 2 img-aud, 3 aud-img
        (multimodal_simclr.py:31-46). audio_only nets always use mode 1.

        Both encoders embed both views and the pair is SELECTED by mode (a jnp.where
        — gradients flow only through the selected branch). The reference runs just
        the chosen encoders; computing all four here keeps BatchNorm state updates
        shape-stable under jit. Deviation: BN running stats update for both encoders
        every step (torch updates only the used ones) — eval-time-only effect."""
        if self.audio_only:
            return self.embed_audio(aud1, train), self.embed_audio(aud2, train)
        zi1 = self.embed_image(img1, train)
        zi2 = self.embed_image(img2, train)
        za1 = self.embed_audio(aud1, train)
        za2 = self.embed_audio(aud2, train)
        use_img1 = (mode == 0) | (mode == 2)   # view-1 modality
        use_img2 = (mode == 0) | (mode == 3)   # view-2 modality
        z1 = jnp.where(use_img1, zi1, za1)
        z2 = jnp.where(use_img2, zi2, za2)
        return z1, z2

    def init_all(self, img, aud, train: bool = False):
        out = (self.embed_audio(aud, train),)
        if not self.audio_only:
            out = out + (self.embed_image(img, train),)
        return out


@dataclasses.dataclass
class SimCLRConfig:
    output_dim: int = 256
    projection_dim: int = 256
    learning_rate: float = 1e-4
    num_epochs: int = 100
    steps_per_epoch: Optional[int] = None
    temperature: float = 0.07
    audio_only: bool = False
    audio_encoder_name: str = "spectrogram_simple"
    best_augments: Optional[Dict] = None
    audio_mean: float = 0.0
    audio_std: float = 1.0
    compute_dtype: Any = jnp.bfloat16
    # jax.checkpoint on each encoder+head forward (HBM-bound step: trade
    # stored-activation traffic for MXU recompute; identical up to float
    # reassociation — see DinoConfig.remat_student). Default off until
    # measured on the chip.
    remat: bool = False
    identity_augment: bool = False  # views = untransformed copies. Used by the
    # meshed-vs-single EXACT equivalence checks (driver dryrun, mesh tests):
    # under a mesh the bank runs in shard_map with per-device RNG streams, so
    # full-augment equivalence is only distributional (docs/DEVIATIONS.md).


def make_simclr_objective(cfg: SimCLRConfig, mesh=None) -> Objective:
    """``mesh``: data-parallel mesh the step runs under (see
    common.anchor_data_sharding — re-anchors the augmented views so GSPMD
    partitions the encoders instead of replicating them). Binds to the mesh."""
    net = _SimCLRNet(output_dim=cfg.output_dim, projection_dim=cfg.projection_dim,
                     audio_only=cfg.audio_only,
                     audio_encoder_name=cfg.audio_encoder_name)
    augment = (SimCLRAugment(image_ops=(), audio_ops=())
               if cfg.identity_augment
               else SimCLRAugment.from_config(cfg.best_augments))
    # Under a mesh the bank runs in shard_map (local per-device compute, zero
    # fold-boundary resharding — common.shard_map_augment).
    aug_fn = shard_map_augment(augment, mesh)
    lr = (cosine_epoch_schedule(cfg.learning_rate, cfg.num_epochs, cfg.steps_per_epoch)
          if cfg.steps_per_epoch else cfg.learning_rate)
    tx = torch_adam(lr)

    img0 = jnp.zeros((2, 28, 28, 1))
    aud0 = jnp.zeros((2, 112, 112, 1))

    def init_fn(rng) -> TrainState:
        variables = net.init({"params": rng, "dropout": rng}, img0, aud0,
                             train=False, method="init_all")
        return TrainState(step=jnp.zeros((), jnp.int32),
                          params=variables["params"],
                          batch_stats=variables.get("batch_stats", {}),
                          opt_state=tx.init(variables["params"]))

    def _embed(params, stats, rng, x, image: bool, train=True):
        method = "embed_image" if image else "embed_audio"

        def run(params_, stats_, rng_, x_):
            variables = {"params": cast_tree(params_, cfg.compute_dtype),
                         "batch_stats": cast_tree(stats_, cfg.compute_dtype)}
            z, upd = net.apply(variables, x_.astype(cfg.compute_dtype),
                               train=train, rngs={"dropout": rng_},
                               mutable=["batch_stats"], method=method)
            return (z.astype(jnp.float32),
                    cast_tree(upd["batch_stats"], jnp.float32))

        if cfg.remat and train:
            run = jax.checkpoint(run)
        return run(params, stats, rng, x)

    def _torch_branch_semantics() -> bool:
        """Ablation toggle (docs/DEVIATIONS.md "Training-dynamics notes"):
        AVMNIST_TORCH_ADAM_BRANCHES=1 reproduces torch's grad=None handling —
        params AND Adam moments of the encoders a mode does not touch stay
        frozen, instead of optax's zero-grad decay + momentum coasting. The
        global Adam step count still advances (optax has one count; torch keeps
        per-param steps), so bias correction differs negligibly for long runs."""
        import os

        return os.environ.get("AVMNIST_TORCH_ADAM_BRANCHES", "0").lower() in (
            "1", "true", "on")

    def _make_branch(v1_image: bool, v2_image: bool):
        """One per-mode training step (multimodal_simclr.py:31-46). Only the two
        encoders the mode selects are executed — matching the reference's compute —
        and lax.switch over WHOLE steps keeps flax's mutable collections out of the
        branch boundary."""
        frozen: tuple = ()
        if not cfg.audio_only and _torch_branch_semantics():
            if v1_image and v2_image:
                frozen = ("audio_encoder", "audio_projection_head")
            elif not (v1_image or v2_image):
                frozen = ("image_encoder", "image_projection_head")

        def _restore(new_tree, old_tree):
            """Per-top-level-key select: frozen subtrees keep their old leaves."""
            return {k: (old_tree[k] if k in frozen else v)
                    for k, v in new_tree.items()}

        def branch(operands):
            state, img1, aud1, img2, aud2, k_net = operands
            k1, k2 = jax.random.split(k_net)

            def loss_fn(params):
                z1, stats = _embed(params, state.batch_stats, k1,
                                   img1 if v1_image else aud1, v1_image)
                z2, stats = _embed(params, stats, k2,
                                   img2 if v2_image else aud2, v2_image)
                return nt_xent_loss(z1, z2, cfg.temperature), stats

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            if frozen:
                params = _restore(params, state.params)
                opt_state = jax.tree.map(
                    lambda n, o: (_restore(n, o)
                                  if isinstance(n, dict) and frozen[0] in n else n),
                    opt_state, state.opt_state,
                    is_leaf=lambda x: isinstance(x, dict) and frozen[0] in x)
            return state.replace(step=state.step + 1, params=params,
                                 batch_stats=new_stats, opt_state=opt_state), loss

        return branch

    # mode order: 0 img-img, 1 aud-aud, 2 img-aud, 3 aud-img
    _branches = [_make_branch(True, True), _make_branch(False, False),
                 _make_branch(True, False), _make_branch(False, True)]

    @jax.jit
    def step_fn(state: TrainState, batch: Dict, rng) -> tuple:
        rng = per_step_rng(rng, state)  # REQUIRED contract: per-step stream from the per-epoch key (objectives.common)
        k_aug, k_mode, k_net = jax.random.split(rng, 3)
        images = normalize_images(batch["image"])
        audios = normalize_audio(batch["audio"], cfg.audio_mean, cfg.audio_std)
        img1, aud1, img2, aud2 = anchor_data_sharding(
            aug_fn(images[..., 0], audios[..., 0], k_aug), mesh)
        operands = (state, img1, aud1, img2, aud2, k_net)
        if cfg.audio_only:
            mode = jnp.ones((), jnp.int32)
            new_state, loss = _branches[1](operands)
        else:
            mode = jax.random.randint(k_mode, (), 0, 4)
            new_state, loss = jax.lax.switch(mode, _branches, operands)
        return new_state, {"train_loss": loss, "mode": mode.astype(jnp.float32)}

    def _feature(method):
        @jax.jit
        def fn(state: TrainState, batch: Dict) -> jnp.ndarray:
            x = (normalize_images(batch["image"]) if method == "image_features"
                 else normalize_audio(batch["audio"], cfg.audio_mean, cfg.audio_std))
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            return net.apply(variables, x, train=False, method=method)
        return fn

    feature_fns = {"audio": _feature("audio_features")}
    if not cfg.audio_only:
        feature_fns["image"] = _feature("image_features")

    name = "audio_simclr" if cfg.audio_only else "multimodal_simclr"
    return Objective(name, init_fn, step_fn, feature_fn=feature_fns["audio"],
                     meta={"config": cfg, "net": net, "feature_fns": feature_fns})
