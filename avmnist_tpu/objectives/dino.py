"""DINO SSL objective (multimodal + unimodal) with the three hybrid modes.

Reference: models/dino.py — MultiModalDINO (:588-727), MultiModalDINOLightning loss
(:822-854), UniModalDINO (:1257-1398), UniModalDINOLightning (:1492-1759), hybrids
MultiModalDINOWithMSE/INFONCE/SemiSupervised (:964-1238).

TPU-native restructuring (NOT a translation):
- the Python loop over views (dino.py:679-706) is folded into the batch axis: ONE
  student forward over [(Ng+Nl)*B] and one teacher forward over [Ng*B];
- augmentation (multi-crop view bank) runs inside the same jitted step — batch in,
  loss out, zero host round-trips;
- the EMA teacher is a second param pytree updated with a fused tree_map;
- the center update is a GLOBAL batch mean: under a sharded batch XLA lowers it to a
  psum over ICI, fixing the reference's per-replica center drift (SURVEY.md §2e)
  while being bit-identical on one chip;
- the InfoNCE hybrid's similarity matrix is computed on the global batch, i.e.
  all-gathered negatives over ICI for free.

Reference-faithful quirks preserved (config switches in config.schema):
L2-normalize before softmax (dino.py:831-832); no same-view-pair exclusion (:843-847);
unimodal double centering (buffer in forward :1388 + batch re-center in loss :1613);
teacher EMA from PRE-optimizer-step student params (:871 runs before Lightning's
optimizer step).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from avmnist_tpu.augment.multicrop import MultiCropAugment
from avmnist_tpu.models.layers import ProjectionHead
from avmnist_tpu.models.registry import build_encoder, is_unimodal
from avmnist_tpu.objectives.common import (
    Objective,
    anchor_data_sharding,
    cast_tree,
    cross_entropy,
    normalize_audio,
    normalize_images,
    per_step_rng,
    shard_map_augment,
)
from avmnist_tpu.train.optim import cosine_epoch_schedule, torch_adam
from avmnist_tpu.train.state import TrainState


class DINONet(nn.Module):
    """Encoder + DINO projection head (+ per-modality hybrid heads).

    The teacher is a second DINONet with mode='default' — same encoder/projection
    structure; hybrid heads belong to the student only (reference update_teacher
    EMAs only encoder+projection, dino.py:635-646)."""

    encoder: nn.Module
    projection_dim: int = 128
    dropout: float = 0.3
    unimodal: bool = False
    mode: str = "default"  # default | semi_supervised | mse | infonce
    num_classes: int = 10
    encoder_output_dim: int = 512

    def setup(self):
        self.projection = ProjectionHead(self.projection_dim, dropout_rate=self.dropout)
        if self.mode in ("mse", "infonce"):
            self.image_head = ProjectionHead(self.projection_dim)
            self.audio_head = ProjectionHead(self.projection_dim)
        elif self.mode == "semi_supervised":
            self.image_head = ProjectionHead(self.num_classes)
            self.audio_head = ProjectionHead(self.num_classes)

    def encode(self, images, spectrograms, train: bool = True):
        if self.unimodal:
            return self.encoder(images=images, spectrograms=spectrograms, train=train)
        return self.encoder(images, spectrograms, train=train)

    def __call__(self, images, spectrograms, train: bool = True):
        f = self.encode(images, spectrograms, train=train)
        return self.projection(f, train=train), f

    def modality_projections(self, images, spectrograms, train: bool = True):
        """Hybrid taps on the UN-augmented pair (dino.py:1065-1066, 977-978)."""
        f_i = self.encoder.encode_image(images, train=train)
        f_a = self.encoder.encode_audio(spectrograms, train=train)
        return self.image_head(f_i, train=train), self.audio_head(f_a, train=train)

    def init_all(self, images, spectrograms, train: bool = False):
        """Init helper: touches every submodule so flax materializes all params."""
        out = self(images, spectrograms, train=train)
        if self.mode != "default":
            self.modality_projections(images, spectrograms, train=train)
        return out


def dino_loss_fn(student_out, teacher_out, student_temp, teacher_temp,
                 l2_normalize=True, unimodal_recenter=False):
    """Cross-entropy over ALL (student view x teacher view) pairs.

    student_out [Ns, B, P]; teacher_out [Nt, B, P] (already buffer-centered).
    Faithful to dino.py:822-854 (multimodal) / :1596-1635 (unimodal re-centering)."""
    if l2_normalize:
        student_out = student_out / (jnp.linalg.norm(student_out, axis=-1, keepdims=True) + 1e-12)
        teacher_out = teacher_out / (jnp.linalg.norm(teacher_out, axis=-1, keepdims=True) + 1e-12)
    if unimodal_recenter:
        teacher_out = teacher_out - jnp.mean(teacher_out, axis=1, keepdims=True)
    t_probs = jax.nn.softmax(teacher_out / teacher_temp, axis=-1)       # [Nt,B,P]
    s_logp = jax.nn.log_softmax(student_out / student_temp, axis=-1)    # [Ns,B,P]
    b = student_out.shape[1]
    cross = -jnp.einsum("tbp,sbp->ts", t_probs, s_logp) / b             # [Nt,Ns]
    return cross.mean(), t_probs


def cosine_consistency_loss(embeddings):
    """(1 - cos)^2 over all student-view pairs (UniModalDINOLightning:1575-1594)."""
    e = embeddings / (jnp.linalg.norm(embeddings, axis=-1, keepdims=True) + 1e-12)
    n = e.shape[0]
    sims = jnp.einsum("ibd,jbd->ijb", e, e)
    iu, ju = jnp.triu_indices(n, k=1)
    return jnp.mean((1.0 - sims[iu, ju]) ** 2)


def infonce_loss_fn(image_out, audio_out, temperature=0.07):
    """Symmetric cross-modal InfoNCE (dino.py:1091-1128). With a sharded batch the
    B x B similarity is global — all-gathered negatives over ICI."""
    i = image_out / (jnp.linalg.norm(image_out, axis=-1, keepdims=True) + 1e-12)
    a = audio_out / (jnp.linalg.norm(audio_out, axis=-1, keepdims=True) + 1e-12)
    sim = (i @ a.T) / temperature
    labels = jnp.arange(sim.shape[0])
    l_i2a = optax.softmax_cross_entropy_with_integer_labels(sim, labels).mean()
    l_a2i = optax.softmax_cross_entropy_with_integer_labels(sim.T, labels).mean()
    return 0.5 * (l_i2a + l_a2i)


def mse_align_loss_fn(image_out, audio_out):
    """Normalized-feature MSE (dino.py:1193-1211)."""
    i = image_out / (jnp.linalg.norm(image_out, axis=-1, keepdims=True) + 1e-12)
    a = audio_out / (jnp.linalg.norm(audio_out, axis=-1, keepdims=True) + 1e-12)
    return jnp.mean((i - a) ** 2)


@dataclasses.dataclass
class DinoConfig:
    model_name: str = "multi_central"
    mode: str = "default"
    projection_dim: int = 128
    output_dim: int = 256
    encoder_output_dim: int = 256
    momentum: float = 0.996
    center_momentum: float = 0.9
    student_temperature: float = 0.1
    teacher_temperature: float = 0.04
    learning_rate: float = 1e-4
    weight_decay: float = 1e-6
    dropout: float = 0.3
    num_epochs: int = 100
    steps_per_epoch: Optional[int] = None
    # 0 = reference-exact (no warmup). >0 prepends a linear per-step LR ramp —
    # canonical DINO collapse protection, opt-in only (docs/DEVIATIONS.md).
    lr_warmup_epochs: int = 0
    n_global_views: int = 2
    n_local_views: int = 4
    best_augments: Optional[Dict] = None
    alpha: float = 1.0                 # hybrid loss weight
    cosine_loss_alpha: float = 0.0     # unimodal only
    num_classes: int = 10
    audio_mean: float = 0.0
    audio_std: float = 1.0
    use_center: bool = True            # False = UniModalDINOV2 (dino.py:1400-1489)
    encoder_kwargs: Optional[Dict] = None  # extra encoder ctor args (dino.py:609-612)
    per_view_bn: bool = False          # True = BatchNorm batch stats PER VIEW (exact
    # reference semantics: the torch loop normalizes each view separately,
    # dino.py:679-706). Default False normalizes over the folded [views*B] batch —
    # faster (one fused forward) but global+local crop statistics mix in BN.
    compute_dtype: Any = jnp.bfloat16
    # Rematerialize the STUDENT forward in the backward pass (jax.checkpoint,
    # save-nothing policy). The step is HBM-bandwidth-bound (60 % of nominal
    # roofline, docs/PERF_NOTES.md): the backward otherwise re-reads the
    # stored 112x112 stem activations of 6 view-forwards from HBM, while
    # recompute costs MXU FLOPs the step has to spare (8.4 % MFU). Numerics
    # are identical up to float reassociation (the checkpoint barrier moves
    # XLA fusion boundaries, so BN-mean reduction order shifts — measured
    # ~5e-5 rel on the step loss in f32; tests pin rtol 1e-3).
    # Teacher/hybrid passes take no remat (no gradient flows through them).
    remat_student: bool = False
    # reference-faithful switches (SURVEY.md §7 hard-part 5)
    l2_normalize_before_softmax: bool = True
    unimodal_double_centering: bool = True
    teacher_ema_before_optimizer: bool = True
    identity_augment: bool = False     # profiling only: tile views, no transforms


def make_dino_objective(cfg: DinoConfig, mesh=None) -> Objective:
    """``mesh``: data-parallel mesh the step will run under, or None for
    single-device. Needed so the folded views can be re-anchored onto the data
    axis after augmentation (anchor_data_sharding — without it GSPMD replicates
    the whole network per device). The objective binds to this mesh."""
    unimodal = is_unimodal(cfg.model_name)
    if unimodal and cfg.mode != "default":
        raise ValueError("hybrid modes are multimodal-only (run_dino.py:585-593)")
    encoder = build_encoder(cfg.model_name, output_dim=cfg.output_dim,
                            **({} if unimodal else
                               {"encoder_output_dim": cfg.encoder_output_dim}),
                            **(cfg.encoder_kwargs or {}))
    student = DINONet(encoder=encoder, projection_dim=cfg.projection_dim,
                      dropout=cfg.dropout, unimodal=unimodal, mode=cfg.mode,
                      num_classes=cfg.num_classes,
                      encoder_output_dim=cfg.encoder_output_dim)
    # teacher: same structure, no hybrid heads, no dropout in projection (the module is
    # shared; dropout is inert because the teacher pass uses its own rng & train flag).
    teacher = DINONet(encoder=encoder, projection_dim=cfg.projection_dim,
                      dropout=0.0, unimodal=unimodal, mode="default",
                      num_classes=cfg.num_classes,
                      encoder_output_dim=cfg.encoder_output_dim)

    augment = MultiCropAugment.from_config(cfg.n_global_views, cfg.n_local_views,
                                           cfg.best_augments)
    if cfg.identity_augment:  # profiling hook: tile views, skip every transform
        augment = MultiCropAugment(
            n_global_views=cfg.n_global_views, n_local_views=cfg.n_local_views,
            image_global=(), image_local=(), audio_global=(), audio_local=())
    lr = (cosine_epoch_schedule(cfg.learning_rate, cfg.num_epochs, cfg.steps_per_epoch,
                                warmup_epochs=cfg.lr_warmup_epochs)
          if cfg.steps_per_epoch else cfg.learning_rate)
    tx = torch_adam(lr, weight_decay=cfg.weight_decay)

    img0 = jnp.zeros((2, 28, 28, 1))
    aud0 = jnp.zeros((2, 112, 112, 1))

    def init_fn(rng) -> TrainState:
        k1, k2 = jax.random.split(rng)
        sv = student.init({"params": k1, "dropout": k2}, img0, aud0, train=False,
                          method="init_all")
        params, stats = sv["params"], sv.get("batch_stats", {})
        # teacher starts as an exact copy of the student (dino.py:617, 627)
        t_params = {k: params[k] for k in ("encoder", "projection")}
        t_stats = {k: stats[k] for k in stats if k in ("encoder", "projection")}
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=stats,
            opt_state=tx.init(params),
            teacher_params=jax.tree.map(jnp.copy, t_params),
            teacher_batch_stats=jax.tree.map(jnp.copy, t_stats),
            center=jnp.zeros((1, cfg.projection_dim), jnp.float32),
        )

    ng, nl = cfg.n_global_views, cfg.n_local_views
    # The augment bank runs under shard_map over the data axis when a mesh is
    # given: each device augments its local shard, deleting the measured
    # 1.24 GB/step fold-boundary resharding (see common.shard_map_augment).
    aug_fn = shard_map_augment(augment, mesh)

    def fold(views):
        """(B, n, H, W, 1) -> (B*n, H, W, 1), BATCH-major.

        Batch-major (sample 0's views, then sample 1's, ...) keeps the fold a
        purely LOCAL reshape when the batch axis is sharded — the round-4
        view-major fold (swapaxes + reshape, torch.cat order) interleaved the
        sharded axis and forced an all-to-all at the fold boundary. The
        (view, sample) pair SET is unchanged; only the dropout-mask assignment
        ordering differs (distributional only — docs/DEVIATIONS.md)."""
        b, n = views.shape[:2]
        return views.reshape(b * n, *views.shape[2:])

    def unfold(folded, n):
        """(B*n, P) batch-major -> (n, B, P) view-major for the loss math."""
        b = folded.shape[0] // n
        return folded.reshape(b, n, *folded.shape[1:]).swapaxes(0, 1)

    def apply_net(net, params, stats, images, audios, rng, train, method=None,
                  remat=False):
        def run(params_, stats_, images_, audios_, rng_):
            variables = {"params": cast_tree(params_, cfg.compute_dtype),
                         "batch_stats": cast_tree(stats_, cfg.compute_dtype)}
            args = (images_.astype(cfg.compute_dtype),
                    audios_.astype(cfg.compute_dtype))
            out, upd = net.apply(variables, *args, train=train,
                                 rngs={"dropout": rng_}, mutable=["batch_stats"],
                                 method=method)
            return (jax.tree.map(lambda x: x.astype(jnp.float32), out),
                    cast_tree(upd["batch_stats"], jnp.float32))

        if remat:
            run = jax.checkpoint(run)
        return run(params, stats, images, audios, rng)

    @jax.jit
    def step_fn(state: TrainState, batch: Dict, rng) -> tuple:
        rng = per_step_rng(rng, state)  # REQUIRED contract: per-step stream from the per-epoch key (objectives.common)
        k_aug, k_s, k_t, k_h = jax.random.split(rng, 4)
        images = normalize_images(batch["image"])
        audios = normalize_audio(batch["audio"], cfg.audio_mean, cfg.audio_std)
        # Under a mesh the bank runs in shard_map (local per-device compute,
        # zero fold-boundary resharding — common.shard_map_augment).
        gi, ga, li, la = aug_fn(images[..., 0], audios[..., 0], k_aug)
        b = images.shape[0]

        # Student sees global + local; teacher global only — one forward each.
        # Views concatenate on the VIEW axis (unsharded) so the batch-major
        # fold stays a local reshape under the data sharding: per sample the
        # student view order is [g0..g_{ng-1}, l0..l_{nl-1}]. anchor: keep the
        # folded views pinned to 'data' so GSPMD propagates batch parallelism
        # into the network (common.py).
        s_imgs = anchor_data_sharding(fold(jnp.concatenate([gi, li], axis=1)), mesh)
        s_auds = anchor_data_sharding(fold(jnp.concatenate([ga, la], axis=1)), mesh)
        t_imgs = anchor_data_sharding(fold(gi), mesh)
        t_auds = anchor_data_sharding(fold(ga), mesh)

        def apply_views(net_, params_, stats_, imgs_, auds_, key_, n_views,
                        remat=False):
            """Forward over folded views; with per_view_bn, vmap per view so BN batch
            statistics are computed per view (exact reference semantics,
            dino.py:679-706; running stats merged by mean across views)."""
            if not cfg.per_view_bn:
                return apply_net(net_, params_, stats_, imgs_, auds_, key_,
                                 train=True, remat=remat)
            # batch-major fold -> view-major for the per-view vmap, and back
            imgs_v = unfold(imgs_, n_views)
            auds_v = unfold(auds_, n_views)
            keys = jax.random.split(key_, n_views)

            def one(im, au, kk):
                return apply_net(net_, params_, stats_, im, au, kk, train=True,
                                 remat=remat)

            (projs_v, feats_v), stats_v = jax.vmap(one)(imgs_v, auds_v, keys)
            merged = jax.tree.map(lambda x: x.mean(0), stats_v)
            return (projs_v.swapaxes(0, 1).reshape(n_views * b, -1),
                    feats_v.swapaxes(0, 1).reshape(n_views * b, -1)), merged

        # Teacher pass (outside grad; train-mode BN like the reference, whose teacher
        # modules stay in train() — SURVEY.md §7 hard-part 4).
        (t_projs, _), t_stats = apply_views(teacher, state.teacher_params,
                                            state.teacher_batch_stats,
                                            t_imgs, t_auds, k_t, ng)
        t_projs = jax.lax.stop_gradient(t_projs)
        center = state.center if cfg.use_center else jnp.zeros_like(state.center)
        t_centered = unfold(t_projs - center, ng)
        # Global-batch center update (psum over the data axis under sharding);
        # OLD center is applied above, then updated (dino.py:713-717).
        new_center = (state.center * cfg.center_momentum
                      + jnp.mean(t_projs, axis=0, keepdims=True) * (1 - cfg.center_momentum)) \
            if cfg.use_center else state.center

        def loss_fn(params):
            (s_projs, s_feats), new_stats = apply_views(
                student, params, state.batch_stats, s_imgs, s_auds, k_s, ng + nl,
                remat=cfg.remat_student)
            s_out = unfold(s_projs, ng + nl)
            d_loss, t_probs = dino_loss_fn(
                s_out, t_centered, cfg.student_temperature, cfg.teacher_temperature,
                cfg.l2_normalize_before_softmax,
                unimodal_recenter=(unimodal and cfg.unimodal_double_centering
                                   and cfg.use_center))
            metrics = {"dino_loss": d_loss}
            loss = d_loss
            if unimodal and cfg.cosine_loss_alpha > 0:
                c_loss = cosine_consistency_loss(unfold(s_feats, ng + nl))
                loss = loss + cfg.cosine_loss_alpha * c_loss
                metrics["cosine_loss"] = c_loss
            if cfg.mode in ("mse", "infonce", "semi_supervised"):
                (h_img, h_aud), new_stats2 = apply_net(
                    student, params, new_stats, images, audios, k_h, train=True,
                    method="modality_projections")
                new_stats = new_stats2
                if cfg.mode == "infonce":
                    h = infonce_loss_fn(h_img, h_aud)
                elif cfg.mode == "mse":
                    h = mse_align_loss_fn(h_img, h_aud)
                else:
                    h = (cross_entropy(h_img, batch["label"])
                         + cross_entropy(h_aud, batch["label"]))
                loss = loss + cfg.alpha * h
                metrics["hybrid_loss"] = h
            # collapse detector: teacher prob entropy (first-class, SURVEY.md §5)
            metrics["teacher_entropy"] = -jnp.mean(
                jnp.sum(t_probs * jnp.log(t_probs + 1e-10), axis=-1))
            return loss, (new_stats, metrics)

        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # EMA teacher from PRE-update student params (dino.py:871; faithful default).
        ema_src = {k: state.params[k] for k in state.teacher_params}
        new_teacher = jax.tree.map(
            lambda t, s: cfg.momentum * t + (1.0 - cfg.momentum) * s,
            state.teacher_params, ema_src)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if not cfg.teacher_ema_before_optimizer:
            new_teacher = jax.tree.map(
                lambda t, s: cfg.momentum * t + (1.0 - cfg.momentum) * s,
                state.teacher_params, {k: params[k] for k in state.teacher_params})

        metrics = dict(metrics)
        metrics["train_loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state, teacher_params=new_teacher,
            teacher_batch_stats=t_stats, center=new_center)
        return new_state, metrics

    @jax.jit
    def feature_fn(state: TrainState, batch: Dict) -> jnp.ndarray:
        """Frozen student ENCODER features (what DownstreamClassifier/FeatureExtractor
        consume, dino.py:1764-1851), eval mode."""
        images = normalize_images(batch["image"])
        audios = normalize_audio(batch["audio"], cfg.audio_mean, cfg.audio_std)
        variables = {"params": state.params.get("encoder"),
                     "batch_stats": state.batch_stats.get("encoder", {})}
        if unimodal:
            return encoder.apply(variables, images=images, spectrograms=audios,
                                 train=False)
        return encoder.apply(variables, images, audios, train=False)

    def _apply_encoder(variables, images, audios, **kw):
        if unimodal:
            return encoder.apply(variables, images=images, spectrograms=audios, **kw)
        return encoder.apply(variables, images, audios, **kw)

    @jax.jit
    def feature_fn_train(state: TrainState, batch: Dict, rng, enc_stats):
        """Train-mode probe features: batch-stat BN + active dropout, running stats
        updated in the probe's own copy — DownstreamClassifier under
        ``model_downstream.train()`` (reference dino.py:888, 1764-1814). Returns
        (features, updated_stats); thread ``enc_stats`` sequentially across batches."""
        images = normalize_images(batch["image"])
        audios = normalize_audio(batch["audio"], cfg.audio_mean, cfg.audio_std)
        variables = {"params": state.params.get("encoder"), "batch_stats": enc_stats}
        out, upd = _apply_encoder(variables, images, audios, train=True,
                                  mutable=["batch_stats"], rngs={"dropout": rng})
        return out, upd["batch_stats"]

    @jax.jit
    def feature_fn_stats(state: TrainState, batch: Dict, enc_stats):
        """Eval-mode features with EXPLICIT running stats (post-probe-training eval,
        reference dino.py:915-917 ``model.eval()`` after a train()-mode epoch)."""
        images = normalize_images(batch["image"])
        audios = normalize_audio(batch["audio"], cfg.audio_mean, cfg.audio_std)
        variables = {"params": state.params.get("encoder"), "batch_stats": enc_stats}
        return _apply_encoder(variables, images, audios, train=False)

    def initial_probe_stats(state: TrainState):
        return state.batch_stats.get("encoder", {})

    return Objective(f"dino_{cfg.model_name}_{cfg.mode}", init_fn, step_fn,
                     eval_fn=None, feature_fn=feature_fn,
                     meta={"config": cfg, "student": student, "teacher": teacher,
                           "encoder": encoder,
                           "augment": augment, "unimodal": unimodal,
                           "feature_fn_train": feature_fn_train,
                           "feature_fn_stats": feature_fn_stats,
                           "initial_probe_stats": initial_probe_stats})
