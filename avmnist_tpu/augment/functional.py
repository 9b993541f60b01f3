"""Pure, PRNG-key-driven augmentation primitives (device-side, jit/vmap-safe).

Rebuilds the reference's per-sample CPU torchvision/torchaudio transform bank
(get_data.py:21-408) as fixed-shape JAX ops:

- All geometric ops (RandomResizedCrop, RandomRotation, RandomAffine, the
  TimeStretch-based TimeWarp) are expressed as 3x3 inverse-map affine matrices and
  composed into a SINGLE bilinear gather per chain segment — one resample instead of
  the reference's sequential PIL/tensor resamples.
- Dynamic-shape reference ops are recast as fixed-shape math (SURVEY.md §7 hard-part 3):
  TimeStretch's variable-length output + pad/trim (get_data.py:47-56) becomes an
  x-axis scale about the origin with zero fill; RandomResizedCrop's data-dependent
  box becomes a traced scale/translate.
- `RandomApply(p)` is a `jnp.where` on the op's matrix (geometric) or output (pixel
  ops) — branchless, XLA-friendly.

Randomness parity is distributional, not bitwise (torch consumes global CPU RNG;
parity criterion is probe accuracy within 0.5%, SURVEY.md §7 hard-part 2). Exact-value
behavior at FIXED parameters is unit-tested instead.

All functions operate on a single-channel image ``img: (H, W) float32`` and are
vmapped over batch/views by the callers in multicrop.py / simclr.py.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# ----------------------------- affine machinery -----------------------------

IDENTITY = jnp.eye(3, dtype=jnp.float32)


def _mat(sx, sy, tx, ty) -> Array:
    """Axis-aligned inverse-map matrix: in_x = sx*out_x + tx, in_y = sy*out_y + ty."""
    z = jnp.zeros(())
    return jnp.array(
        [[sx, z, tx], [z, sy, ty], [z, z, jnp.ones(())]], dtype=jnp.float32
    )


def _rot_mat(theta, cx, cy) -> Array:
    """Inverse-map rotation about center (cx, cy)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    # in = R(theta) (out - c) + c
    tx = cx - c * cx + s * cy
    ty = cy - s * cx - c * cy
    z = jnp.zeros(())
    return jnp.array(
        [[c, -s, tx], [s, c, ty], [z, z, jnp.ones(())]], dtype=jnp.float32
    )


def maybe(key, p: float, mat: Array) -> Array:
    """RandomApply for a matrix op: identity with prob 1-p."""
    return jnp.where(jax.random.bernoulli(key, p), mat, IDENTITY)


def affine_bilinear(img: Array, mat: Array, out_shape: Optional[Tuple[int, int]] = None) -> Array:
    """Bilinear resample with zero fill outside: out[y, x] = img(mat @ [x, y, 1])."""
    H, W = img.shape
    oh, ow = out_shape or (H, W)
    oy = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    ox = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    in_x = mat[0, 0] * ox + mat[0, 1] * oy + mat[0, 2]
    in_y = mat[1, 0] * ox + mat[1, 1] * oy + mat[1, 2]
    x0 = jnp.floor(in_x)
    y0 = jnp.floor(in_y)
    wx = in_x - x0
    wy = in_y - y0

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1).astype(jnp.int32),
                jnp.clip(xi, 0, W - 1).astype(jnp.int32)]
        return jnp.where(valid, v, 0.0)

    return (
        tap(y0, x0) * (1 - wx) * (1 - wy)
        + tap(y0, x0 + 1) * wx * (1 - wy)
        + tap(y0 + 1, x0) * (1 - wx) * wy
        + tap(y0 + 1, x0 + 1) * wx * wy
    )


# ----------------------------- geometric op matrices -----------------------------


def random_resized_crop_mat(
    key, in_hw: Tuple[int, int], out_hw: Tuple[int, int],
    scale: Tuple[float, float], ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Array:
    """torchvision RandomResizedCrop box sampling (single-shot, clamped — torchvision
    retries 10x then center-crops; the clamp keeps the same support)."""
    H, W = in_hw
    oh, ow = out_hw
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = H * W * jax.random.uniform(k1, minval=scale[0], maxval=scale[1])
    logr = jax.random.uniform(
        k2, minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    r = jnp.exp(logr)
    w = jnp.clip(jnp.round(jnp.sqrt(area * r)), 1, W)
    h = jnp.clip(jnp.round(jnp.sqrt(area / r)), 1, H)
    top = jax.random.uniform(k3) * (H - h)
    left = jax.random.uniform(k4) * (W - w)
    sx = w / ow
    sy = h / oh
    # in = left + (out + 0.5) * s - 0.5
    return _mat(sx, sy, left + 0.5 * sx - 0.5, top + 0.5 * sy - 0.5)


def random_rotation_mat(key, degrees: float, hw: Tuple[int, int]) -> Array:
    H, W = hw
    theta = jax.random.uniform(key, minval=-degrees, maxval=degrees) * jnp.pi / 180.0
    return _rot_mat(theta, (W - 1) / 2.0, (H - 1) / 2.0)


def random_affine_mat(
    key, hw: Tuple[int, int],
    translate: Tuple[float, float] = (0.0, 0.0),
    scale: Optional[Tuple[float, float]] = None,
    degrees: float = 0.0,
) -> Array:
    """torchvision RandomAffine (translate fractions, uniform scale, optional rotation)."""
    H, W = hw
    k1, k2, k3, k4 = jax.random.split(key, 4)
    tx = jax.random.uniform(k1, minval=-translate[0], maxval=translate[0]) * W
    ty = jax.random.uniform(k2, minval=-translate[1], maxval=translate[1]) * H
    s = (
        jax.random.uniform(k3, minval=scale[0], maxval=scale[1])
        if scale is not None
        else jnp.ones(())
    )
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    # inverse of (scale about center, then translate): in = (out - t - c)/s + c
    m = _mat(1.0 / s, 1.0 / s, cx - (cx + tx) / s, cy - (cy + ty) / s)
    if degrees:
        m = m @ random_rotation_mat(k4, degrees, hw)
    return m


def time_warp_mat(key, min_factor: float, max_factor: float) -> Array:
    """TimeWarpWithStretch (get_data.py:29-58): a torchaudio TimeStretch phase vocoder
    applied to a zero-phase complex spectrogram + abs + pad/trim. On zero-phase input
    the vocoder magnitude reduces to linear interpolation of columns at positions
    t*rate, so the exact fixed-shape equivalent is an x-scale about the origin with
    zero fill past the stretched end."""
    rate = jax.random.uniform(key, minval=min_factor, maxval=max_factor)
    return _mat(rate, 1.0, jnp.zeros(()), jnp.zeros(()))


# ----------------------------- pixel-space ops -----------------------------


def axis_mask(img: Array, key, mask_param: float, axis: int) -> Array:
    """torchaudio Frequency/TimeMasking: width ~ U(0, param), start ~ U(0, size-width),
    zero the band. axis=0 masks rows (frequency), axis=1 masks columns (time)."""
    size = img.shape[axis]
    k1, k2 = jax.random.split(key)
    v = jax.random.uniform(k1) * mask_param
    start = jax.random.uniform(k2) * (size - v)
    idx = jax.lax.broadcasted_iota(jnp.float32, img.shape, axis)
    keep = (idx < start) | (idx >= start + v)
    return img * keep


def gaussian_noise(img: Array, key, std: float) -> Array:
    """GaussianNoise (get_data.py:21-27)."""
    return img + jax.random.normal(key, img.shape) * std


def grouped_masking(img: Array, key, mask_ratio: float, group_size: int = 4) -> Array:
    """GroupedMasking (get_data.py:60-108): zero exactly int(ratio*G) of the
    (H/g)x(W/g) patch groups, chosen uniformly (randperm -> uniform-score top-k)."""
    H, W = img.shape
    gh, gw = H // group_size, W // group_size
    n = gh * gw
    k = int(mask_ratio * n)
    if k == 0:
        return img
    scores = jax.random.uniform(key, (n,))
    thresh = jnp.sort(scores)[k - 1]
    keep = (scores > thresh).astype(img.dtype).reshape(gh, gw)
    keep = jnp.repeat(jnp.repeat(keep, group_size, axis=0), group_size, axis=1)
    return img * keep


def grouped_mask_batch(key, batch_shape: Tuple[int, int, int], mask_ratio: float,
                       group_size: int = 4):
    """Batched mask generator for the masked autoencoders (autoencoder.ipynb cell 5).
    Returns keep-mask (B, H, W) float32 with 0 at masked groups (reference convention)."""
    B, H, W = batch_shape
    gh, gw = H // group_size, W // group_size
    n = gh * gw
    k = int(mask_ratio * n)
    scores = jax.random.uniform(key, (B, n))
    thresh = jnp.sort(scores, axis=1)[:, k - 1 : k]
    keep = (scores > thresh).astype(jnp.float32).reshape(B, gh, gw)
    return jnp.repeat(jnp.repeat(keep, group_size, axis=1), group_size, axis=2)


def random_erasing(img: Array, key, p: float, scale: Tuple[float, float],
                   ratio: Tuple[float, float] = (0.3, 3.3)) -> Array:
    """torchvision RandomErasing(value=0), single-shot box sample with clamping."""
    H, W = img.shape
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    area = H * W * jax.random.uniform(k1, minval=scale[0], maxval=scale[1])
    r = jnp.exp(jax.random.uniform(k2, minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])))
    h = jnp.clip(jnp.round(jnp.sqrt(area * r)), 1, H - 1)
    w = jnp.clip(jnp.round(jnp.sqrt(area / r)), 1, W - 1)
    top = jnp.floor(jax.random.uniform(k3) * (H - h + 1))
    left = jnp.floor(jax.random.uniform(k4) * (W - w + 1))
    ys = jax.lax.broadcasted_iota(jnp.float32, img.shape, 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, img.shape, 1)
    inside = (ys >= top) & (ys < top + h) & (xs >= left) & (xs < left + w)
    erased = jnp.where(inside, 0.0, img)
    return jnp.where(jax.random.bernoulli(k0, p), erased, img)


def gaussian_blur3(img: Array, key, sigma: Tuple[float, float] = (0.1, 0.5)) -> Array:
    """torchvision GaussianBlur(kernel_size=3) with sigma ~ U(range), separable."""
    s = jax.random.uniform(key, minval=sigma[0], maxval=sigma[1])
    x = jnp.array([-1.0, 0.0, 1.0])
    k = jnp.exp(-(x**2) / (2.0 * s**2))
    k = k / k.sum()
    pad = jnp.pad(img, ((1, 1), (0, 0)), mode="edge")
    img = pad[:-2] * k[0] + pad[1:-1] * k[1] + pad[2:] * k[2]
    pad = jnp.pad(img, ((0, 0), (1, 1)), mode="edge")
    return pad[:, :-2] * k[0] + pad[:, 1:-1] * k[1] + pad[:, 2:] * k[2]


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return k / k.sum()


def elastic_transform(img: Array, key, alpha: float = 20.0, sigma: float = 3.0) -> Array:
    """torchvision ElasticTransform approximation: smooth random displacement field
    (uniform noise, separable gaussian blur, scaled by alpha/size) + bilinear warp."""
    H, W = img.shape
    k1, k2 = jax.random.split(key)
    radius = int(3 * sigma)
    kern = _gaussian_kernel1d(sigma, radius)

    def smooth(noise):
        n = jnp.pad(noise, ((radius, radius), (0, 0)), mode="reflect")
        n = jax.vmap(lambda col: jnp.convolve(col, kern, mode="valid"), 1, 1)(n)
        n = jnp.pad(n, ((0, 0), (radius, radius)), mode="reflect")
        return jax.vmap(lambda row: jnp.convolve(row, kern, mode="valid"), 0, 0)(n)

    dx = smooth(jax.random.uniform(k1, (H, W), minval=-1.0, maxval=1.0)) * alpha / W
    dy = smooth(jax.random.uniform(k2, (H, W), minval=-1.0, maxval=1.0)) * alpha / H
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + dy
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + dx
    x0, y0 = jnp.floor(xs), jnp.floor(ys)
    wx, wy = xs - x0, ys - y0

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1).astype(jnp.int32),
                jnp.clip(xi, 0, W - 1).astype(jnp.int32)]
        return jnp.where(valid, v, 0.0)

    return (
        tap(y0, x0) * (1 - wx) * (1 - wy)
        + tap(y0, x0 + 1) * wx * (1 - wy)
        + tap(y0 + 1, x0) * (1 - wx) * wy
        + tap(y0 + 1, x0 + 1) * wx * wy
    )


def maybe_pixel(key, p: float, fn, img: Array, *args) -> Array:
    """RandomApply for a pixel op (both branches computed; XLA fuses the select)."""
    k_gate, k_op = jax.random.split(key)
    return jnp.where(jax.random.bernoulli(k_gate, p), fn(img, k_op, *args), img)
