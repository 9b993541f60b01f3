"""Fused on-device multi-crop view pipeline (DINO).

Rebuilds ``MultiModalAugmentation`` (reference get_data.py:110-297) as a single jitted
``make_views(images, audios, key)`` graph. Per view, consecutive geometric ops are
composed into ONE bilinear gather; pixel ops (masking, noise) flush the pending matrix.
The per-sample/per-view/per-op PRNG tree is derived from one key — the whole 6-view
bank for a 128-batch is ~1.5 GFLOP of VPU work fused into the training step, replacing
the reference's CPU HOT LOOP #1 (SURVEY.md §3.1).

Chain definitions mirror get_data.py:122-192 (defaults) and the ``best_augments``
config-dict path (get_data.py:194-231): image transforms are always the defaults;
audio chains are config-driven in the YAML's key order.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from avmnist_tpu.augment import functional as F

GEOMETRIC = ("random_resized_crop", "random_rotation", "random_affine", "time_warp")


def _op_has_rotation(spec: "OpSpec") -> bool:
    if spec.kind == "random_rotation":
        return True
    return spec.kind == "random_affine" and bool(spec.kw.get("degrees", 0.0))


@dataclasses.dataclass(frozen=True)
class OpSpec:
    kind: str
    params: Tuple[Tuple[str, Any], ...]  # hashable dict
    p: float = 1.0  # RandomApply probability (1.0 = always)

    @property
    def kw(self) -> Dict[str, Any]:
        return dict(self.params)


def op(kind: str, p: float = 1.0, **params) -> OpSpec:
    return OpSpec(kind, tuple(sorted(params.items())), p)


def _matrices_for(spec: OpSpec, key, n: int, hw) -> jnp.ndarray:
    """Batched (N,3,3) inverse maps. RandomApply(spec.p) is folded into the parameter
    sampling (neutral params when gated off) — never a select against a constant
    identity matrix, which XLA:TPU const-folds pathologically."""
    kw = spec.kw
    if spec.kind == "random_resized_crop":
        m = F.random_resized_crop_mats(key, n, hw, hw, tuple(kw["scale"]),
                                       tuple(kw.get("ratio", (0.75, 4.0 / 3.0))),
                                       p=spec.p)
    elif spec.kind == "random_rotation":
        m = F.random_rotation_mats(key, n, kw["degrees"], hw, p=spec.p)
    elif spec.kind == "random_affine":
        m = F.random_affine_mats(key, n, hw, tuple(kw.get("translate", (0.0, 0.0))),
                                 tuple(kw["scale"]) if kw.get("scale") else None,
                                 kw.get("degrees", 0.0), p=spec.p)
    elif spec.kind == "time_warp":
        m = F.time_warp_mats(key, n, kw["min_factor"], kw["max_factor"], p=spec.p)
    else:
        raise ValueError(spec.kind)
    return m


def _apply_pixel(spec: OpSpec, imgs, key):
    kw = spec.kw
    if spec.kind == "frequency_mask":
        return F.maybe_pixel(key, spec.p, F.axis_mask, imgs, kw["freq_mask_param"], 1)
    if spec.kind == "time_mask":
        return F.maybe_pixel(key, spec.p, F.axis_mask, imgs, kw["time_mask_param"], 2)
    if spec.kind == "gaussian_noise":
        return F.maybe_pixel(key, spec.p, F.gaussian_noise, imgs, kw["std"])
    if spec.kind == "grouped_masking":
        return F.maybe_pixel(key, spec.p, F.grouped_masking, imgs, kw["mask_ratio"])
    if spec.kind == "random_erasing":
        return F.random_erasing(imgs, key, spec.p, tuple(kw["scale"]),
                                tuple(kw.get("ratio", (0.3, 3.3))))
    if spec.kind == "gaussian_blur":
        return F.maybe_pixel(key, spec.p, F.gaussian_blur3, imgs, tuple(kw["sigma"]))
    raise ValueError(spec.kind)


def apply_chain(ops: Sequence[OpSpec], imgs: jnp.ndarray, key) -> jnp.ndarray:
    """Apply an op chain to a BATCH (N, H, W): consecutive geometric ops compose into
    one resample per segment (batched matmuls when the segment is statically
    axis-aligned — every audio chain — else one batched gather), pixel ops run
    batched in chain order."""
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    n, h, w = imgs.shape
    keys = jax.random.split(key, max(len(ops), 1))
    pending = None
    pending_rot = False
    for spec, k in zip(ops, keys):
        if spec.kind in GEOMETRIC:
            m = _matrices_for(spec, k, n, (h, w))
            pending = m if pending is None else jnp.einsum("nij,njk->nik", pending, m)
            pending_rot = pending_rot or _op_has_rotation(spec)
        elif spec.kind == "elastic":
            # Fuse the elastic warp into the pending affine: one gather with
            # coords M @ (p + d(p)) — nested gathers blow up XLA compile time.
            disp = F.elastic_displacement(k, imgs.shape, spec.kw.get("alpha", 20.0),
                                          spec.kw.get("sigma", 3.0), spec.p)
            mats = pending if pending is not None else jnp.broadcast_to(
                F.IDENTITY, (n, 3, 3))
            imgs = F.batched_affine_gather(imgs, mats, displacement=disp)
            pending, pending_rot = None, False
        else:
            if pending is not None:
                imgs = F.apply_affine_batch(imgs, pending, pending_rot)
                pending, pending_rot = None, False
            imgs = _apply_pixel(spec, imgs, k)
    if pending is not None:
        imgs = F.apply_affine_batch(imgs, pending, pending_rot)
    return imgs[0] if single else imgs


# --------------------------- default DINO chains (get_data.py:122-192) ---------------------------

IMAGE_GLOBAL: List[OpSpec] = [
    op("random_resized_crop", scale=(0.75, 1.0)),
    op("random_rotation", degrees=5.0),
    op("random_affine", translate=(0.1, 0.1)),
]
IMAGE_LOCAL: List[OpSpec] = [
    op("random_resized_crop", scale=(0.3, 0.75)),
    op("random_rotation", degrees=15.0),
    op("random_affine", translate=(0.2, 0.2), scale=(0.8, 1.2)),
    op("random_erasing", p=0.3, scale=(0.02, 0.15)),
]
AUDIO_GLOBAL: List[OpSpec] = [
    op("random_resized_crop", p=0.5, scale=(0.8, 1.0)),
    op("time_warp", p=0.3, min_factor=0.9, max_factor=1.1),
    op("frequency_mask", p=0.3, freq_mask_param=15),
    op("time_mask", p=0.3, time_mask_param=15),
    op("random_affine", p=0.5, translate=(0.0, 0.1), scale=(0.9, 1.1)),
    op("grouped_masking", p=0.5, mask_ratio=0.15),
]
AUDIO_LOCAL: List[OpSpec] = [
    op("random_resized_crop", p=0.7, scale=(0.5, 0.9)),
    op("time_warp", p=0.7, min_factor=0.7, max_factor=1.3),
    op("frequency_mask", p=0.7, freq_mask_param=25),
    op("time_mask", p=0.7, time_mask_param=25),
    op("random_affine", p=0.7, translate=(0.0, 0.2), scale=(0.7, 1.3)),
    op("gaussian_noise", p=0.7, std=0.1),
    op("grouped_masking", p=0.9, mask_ratio=0.6),
]

_CONFIG_KEYS = {
    "time_warp", "frequency_mask", "time_mask", "grouped_masking",
    "gaussian_noise", "random_affine", "random_resized_crop",
}


def chain_from_config(aug_dict: Dict[str, Dict[str, Any]]) -> List[OpSpec]:
    """Build an audio chain from a best_augments view-dict ({aug: {params..., p}}),
    preserving YAML key order (get_data.py:205-221 / objective_augment.py)."""
    ops = []
    for name, params in aug_dict.items():
        if name not in _CONFIG_KEYS:
            raise ValueError(f"unknown augmentation '{name}'")
        params = dict(params)
        p = float(params.pop("p", 1.0))
        params.pop("size", None)  # output size == input size in this pipeline
        ops.append(op(name, p=p, **params))
    return ops


@dataclasses.dataclass
class MultiCropAugment:
    """Equivalent of MultiModalAugmentation (get_data.py:110-297): yields
    (global_images [B,Ng,28,28,1], global_audios [B,Ng,112,112,1],
     local_images [B,Nl,28,28,1], local_audios [B,Nl,112,112,1])."""

    n_global_views: int = 2
    n_local_views: int = 4
    image_global: Tuple[OpSpec, ...] = tuple(IMAGE_GLOBAL)
    image_local: Tuple[OpSpec, ...] = tuple(IMAGE_LOCAL)
    audio_global: Tuple[OpSpec, ...] = tuple(AUDIO_GLOBAL)
    audio_local: Tuple[OpSpec, ...] = tuple(AUDIO_LOCAL)

    @classmethod
    def from_config(cls, n_global_views=2, n_local_views=4,
                    best_augments: Optional[Dict] = None) -> "MultiCropAugment":
        kwargs = dict(n_global_views=n_global_views, n_local_views=n_local_views)
        if best_augments:
            aug = best_augments.get("augmentations", best_augments)
            probs = best_augments.get("augmentation_probabilities")
            gv, lv = dict(aug["global_views"]), dict(aug["local_views"])
            if probs:  # split-format (objective_augment.py): merge p back in
                for view, d in (("global_views", gv), ("local_views", lv)):
                    for k in d:
                        d[k] = {**d[k], "p": probs[view][k]}
            kwargs["audio_global"] = tuple(chain_from_config(gv))
            kwargs["audio_local"] = tuple(chain_from_config(lv))
        return cls(**kwargs)

    def __call__(self, images: jnp.ndarray, audios: jnp.ndarray, key) -> Tuple[jnp.ndarray, ...]:
        """images (B,28,28) or (B,28,28,1); audios (B,112,112[,1]); normalized floats.

        Each view bank runs as ONE batched chain over (n_views*B) images — views are
        folded into the batch axis end to end."""
        images = images.reshape(images.shape[0], 28, 28)
        audios = audios.reshape(audios.shape[0], 112, 112)
        b = images.shape[0]

        def bank(ops, x, k, n):
            tiled = jnp.tile(x, (n, 1, 1))               # (n*B, H, W)
            out = apply_chain(ops, tiled, k)
            return out.reshape(n, b, *x.shape[1:]).swapaxes(0, 1)[..., None]

        k_gi, k_ga, k_li, k_la = jax.random.split(key, 4)
        return (
            bank(self.image_global, images, k_gi, self.n_global_views),
            bank(self.audio_global, audios, k_ga, self.n_global_views),
            bank(self.image_local, images, k_li, self.n_local_views),
            bank(self.audio_local, audios, k_la, self.n_local_views),
        )

    def describe(self) -> str:
        """Human-readable dump (analog of MultiModalAugmentation.__str__,
        get_data.py:259-297) for performance_summary.txt."""
        lines = [
            "MultiCropAugment(",
            f"  n_global_views={self.n_global_views},",
            f"  n_local_views={self.n_local_views},",
        ]
        for name in ("image_global", "image_local", "audio_global", "audio_local"):
            lines.append(f"  {name}: [")
            for s in getattr(self, name):
                lines.append(f"    {s.kind}(p={s.p}, {dict(s.params)})")
            lines.append("  ],")
        lines.append(")")
        return "\n".join(lines)


def make_views(images, audios, key, n_global_views=2, n_local_views=4,
               best_augments=None):
    """One-call functional entry (the BASELINE.json 'fused device-side preprocessing
    graph'). Returns the 4-tuple of view banks."""
    aug = MultiCropAugment.from_config(n_global_views, n_local_views, best_augments)
    return aug(images, audios, key)
