"""Pure, PRNG-key-driven augmentation primitives (device-side, batched, MXU-first).

Rebuilds the reference's per-sample CPU torchvision/torchaudio transform bank
(get_data.py:21-408) as fixed-shape JAX ops over WHOLE BATCHES:

- Geometric ops (RandomResizedCrop, RandomRotation, RandomAffine, the TimeStretch
  TimeWarp) are 3x3 inverse-map affine matrices composed per chain segment into a
  single resample. Axis-aligned segments (every audio chain: crop/scale/translate/
  time-warp, no rotation) lower to per-sample interpolation matrices and TWO BATCHED
  MATMULS — the resample rides the MXU instead of gather units. Rotation-bearing
  segments (image chains, 28x28) use a batched bilinear gather, which is tiny at that
  size.
- Dynamic-shape reference ops are recast as fixed-shape math (SURVEY.md §7 hard-part
  3): TimeStretch's variable-length output + pad/trim (get_data.py:47-56) is an
  x-scale about the origin with zero fill; RandomResizedCrop's data-dependent box is a
  traced scale/translate.
- ``RandomApply(p)`` is a branchless where/select on matrices or outputs.

Randomness parity is distributional, not bitwise (torch consumes global CPU RNG;
parity criterion is probe accuracy within 0.5%, SURVEY.md §7 hard-part 2); exact-value
behavior at FIXED parameters is unit-tested.

All public functions take batched images ``(N, H, W)`` and per-sample key arrays
``(N,)`` (or one key for batch-level randomness) and are jit-safe.
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
    tx = cx - c * cx + s * cy
    ty = cy - s * cx - c * cy
    z = jnp.zeros(())
    return jnp.array(
        [[c, -s, tx], [s, c, ty], [z, z, jnp.ones(())]], dtype=jnp.float32
    )


def _gate(key, p: float, n: int) -> Optional[Array]:
    """Per-sample RandomApply gate; None when p == 1 (always applied).

    NOTE: RandomApply on geometric ops is implemented by gating the op's PARAMETERS
    to neutral values (scale 1 / shift 0 / angle 0), NOT by selecting between the op
    matrix and a constant identity matrix — XLA:TPU constant-folds gathers through
    constant affine matrices pathologically slowly (100x compile blowup)."""
    if p >= 1.0:
        return None
    return jax.random.bernoulli(key, p, (n,))


def _where_gate(gate: Optional[Array], on: Array, off) -> Array:
    return on if gate is None else jnp.where(gate, on, off)


def _nearest_warp() -> bool:
    """Ablation toggle (docs/DEVIATIONS.md "Rotation/affine interpolation"):
    AVMNIST_NEAREST_WARP=1 switches every composed resample to nearest-neighbor
    — torchvision's default for RandomRotation/RandomAffine — instead of
    bilinear. Read at trace time; used to measure the interpolation-mode
    contribution to the accuracy-parity budget, not as a production mode (the
    reference mixes NEAREST rotations with BILINEAR crops per op; this
    framework composes a chain into one resample, so the mode is global)."""
    import os

    return os.environ.get("AVMNIST_NEAREST_WARP", "0").lower() in ("1", "true", "on")


def _interp_matrix(coords: Array, n_in: int) -> Array:
    """Interpolation matrices from per-sample source coordinates.

    coords (N, n_out): source position of every output pixel; returns (N, n_out, n_in)
    hat-function weights — zero outside [0, n_in-1], which IS zero-fill bilinear.
    Under the nearest-warp ablation the hat collapses to a one-hot at round(coord)."""
    j = jnp.arange(n_in, dtype=jnp.float32)
    if _nearest_warp():
        return (jnp.round(coords[..., None]) == j).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - j))


def separable_resample(imgs: Array, sx, tx, sy, ty,
                       out_hw: Optional[Tuple[int, int]] = None) -> Array:
    """Batched axis-aligned bilinear resample as two matmuls (MXU path).

    imgs (N, H, W); sx/tx/sy/ty (N,) inverse-map params. out = Wy @ img @ Wx^T."""
    n, h, w = imgs.shape
    oh, ow = out_hw or (h, w)
    ox = jnp.arange(ow, dtype=jnp.float32)
    oy = jnp.arange(oh, dtype=jnp.float32)
    wx = _interp_matrix(sx[:, None] * ox + tx[:, None], w)  # (N, ow, W)
    wy = _interp_matrix(sy[:, None] * oy + ty[:, None], h)  # (N, oh, H)
    tmp = jnp.einsum("noh,nhw->now", wy, imgs)
    return jnp.einsum("now,nvw->nov", tmp, wx)


# Below this many output pixels the dense-einsum bilinear (MXU) is used for
# non-separable warps; above it, the 4-tap gather. Gathers on TPU run ~10M elem/s
# (measured: 67 ms for 2048x28x28) while the dense path is matmul-bound (<2 ms).
_DENSE_WARP_MAX_PIXELS = 64 * 64


def _dense_bilinear(imgs: Array, in_x: Array, in_y: Array,
                    oh: int, ow: int) -> Array:
    """Bilinear sample at arbitrary per-pixel source coords as two MXU contractions.

    out[n,o] = sum_y hat(in_y[n,o]-y) * sum_x hat(in_x[n,o]-x) * img[n,y,x]
    The hat weights are zero outside [0, size-1], which IS zero-fill bilinear —
    numerically identical to the masked 4-tap gather."""
    n, h, w = imgs.shape
    ix = in_x.reshape(n, oh * ow)
    iy = in_y.reshape(n, oh * ow)
    ax = _interp_matrix(ix, w)
    by = _interp_matrix(iy, h)
    c = jnp.einsum("now,nhw->noh", ax, imgs)
    return jnp.sum(by * c, axis=-1).reshape(n, oh, ow)


def batched_affine_gather(imgs: Array, mats: Array,
                          out_hw: Optional[Tuple[int, int]] = None,
                          displacement: Optional[Tuple[Array, Array]] = None) -> Array:
    """Batched general-affine bilinear resample with zero fill (rotation path).

    imgs (N, H, W); mats (N, 3, 3) inverse maps. ``displacement`` = optional
    (dy, dx) elastic warp fields composed INTO the same resample
    (in = M @ (p + d(p))) — one pass, matching torchvision's transform order and
    avoiding an XLA compile blowup from gather-of-gather fusion. Small images
    (the 28x28 MNIST chains) take the dense-einsum MXU path; large ones fall back
    to a 4-tap take_along_axis gather."""
    n, h, w = imgs.shape
    oh, ow = out_hw or (h, w)
    oy = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    ox = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    if displacement is not None:
        dy, dx = displacement
        oy = oy + dy
        ox = ox + dx
    in_x = (mats[:, 0, 0, None, None] * ox + mats[:, 0, 1, None, None] * oy
            + mats[:, 0, 2, None, None])
    in_y = (mats[:, 1, 0, None, None] * ox + mats[:, 1, 1, None, None] * oy
            + mats[:, 1, 2, None, None])
    if oh * ow <= _DENSE_WARP_MAX_PIXELS:
        return _dense_bilinear(imgs, in_x, in_y, oh, ow)
    if _nearest_warp():  # ablation: one-tap rounded gather instead of 4-tap
        in_x = jnp.round(in_x)
        in_y = jnp.round(in_y)
    x0 = jnp.floor(in_x)
    y0 = jnp.floor(in_y)
    wx = in_x - x0
    wy = in_y - y0
    flat = imgs.reshape(n, h * w)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = (jnp.clip(yi, 0, h - 1) * w
               + jnp.clip(xi, 0, w - 1)).astype(jnp.int32).reshape(n, -1)
        v = jnp.take_along_axis(flat, idx, axis=1).reshape(n, oh, ow)
        return jnp.where(valid, v, 0.0)

    return (tap(y0, x0) * (1 - wx) * (1 - wy)
            + tap(y0, x0 + 1) * wx * (1 - wy)
            + tap(y0 + 1, x0) * (1 - wx) * wy
            + tap(y0 + 1, x0 + 1) * wx * wy)


def apply_affine_batch(imgs: Array, mats: Array, has_rotation: bool) -> Array:
    """Dispatch: separable matmuls when the chain is statically axis-aligned."""
    if has_rotation:
        return batched_affine_gather(imgs, mats)
    return separable_resample(imgs, mats[:, 0, 0], mats[:, 0, 2],
                              mats[:, 1, 1], mats[:, 1, 2])


# ----------------------------- geometric op matrices (batched) -----------------------------


def random_resized_crop_mats(
    key, n: int, in_hw: Tuple[int, int], out_hw: Tuple[int, int],
    scale: Tuple[float, float], ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    p: float = 1.0,
) -> Array:
    """torchvision RandomResizedCrop box sampling. DEFAULT: the reference-exact
    torchvision sampler — 10 vectorized candidate draws, first in-bounds
    candidate wins, center-crop fallback with ratio clamped to the valid range
    (torchvision transforms.RandomResizedCrop.get_params). The round-2 ablation
    measured the sampler distribution as a multi-σ accuracy lever
    (docs/DEVIATIONS.md), so the exact sampler is the default per the
    quirks-preserved policy. ``AVMNIST_RRC_RETRY=0`` (trace-time toggle) switches
    to the cheaper single-shot-with-clamping variant (same support, slightly
    different density at the extremes). Returns (N,3,3). RandomApply(p) gates
    the sampled box back to the full image."""
    import os

    H, W = in_hw
    oh, ow = out_hw
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    gate = _gate(k0, p, n)
    retry = os.environ.get("AVMNIST_RRC_RETRY", "1").lower() in ("1", "true", "on")
    if retry:
        R = 10
        area = H * W * jax.random.uniform(k1, (R, n), minval=scale[0], maxval=scale[1])
        r = jnp.exp(jax.random.uniform(k2, (R, n), minval=jnp.log(ratio[0]),
                                       maxval=jnp.log(ratio[1])))
        wc = jnp.round(jnp.sqrt(area * r))
        hc = jnp.round(jnp.sqrt(area / r))
        ok = (wc > 0) & (wc <= W) & (hc > 0) & (hc <= H)
        pick = jnp.argmax(ok, axis=0)  # first valid candidate
        any_ok = ok.any(axis=0)
        wi = jnp.take_along_axis(wc, pick[None], 0)[0]
        hi = jnp.take_along_axis(hc, pick[None], 0)[0]
        # torchvision fallback: clamp aspect to the valid range, center crop
        in_ratio = W / H
        fb_w = jnp.where(in_ratio < ratio[0], float(W), jnp.round(H * ratio[1]))
        fb_h = jnp.where(in_ratio < ratio[0], jnp.round(W / ratio[0]), float(H))
        fb_w = jnp.where((in_ratio >= ratio[0]) & (in_ratio <= ratio[1]), float(W), fb_w)
        fb_h = jnp.where((in_ratio >= ratio[0]) & (in_ratio <= ratio[1]), float(H), fb_h)
        w = jnp.where(any_ok, wi, fb_w)
        h = jnp.where(any_ok, hi, fb_h)
        u_top = jax.random.uniform(k3, (n,))
        u_left = jax.random.uniform(k4, (n,))
        # retries draw integer positions; fallback centers the crop
        top = jnp.where(any_ok, jnp.floor(u_top * (H - h + 1)),
                        jnp.round((H - h) / 2.0))
        left = jnp.where(any_ok, jnp.floor(u_left * (W - w + 1)),
                         jnp.round((W - w) / 2.0))
        w = _where_gate(gate, w, float(W))
        h = _where_gate(gate, h, float(H))
        top = _where_gate(gate, top, 0.0)
        left = _where_gate(gate, left, 0.0)
    else:
        area = H * W * jax.random.uniform(k1, (n,), minval=scale[0], maxval=scale[1])
        r = jnp.exp(jax.random.uniform(k2, (n,), minval=jnp.log(ratio[0]),
                                       maxval=jnp.log(ratio[1])))
        w = _where_gate(gate, jnp.clip(jnp.round(jnp.sqrt(area * r)), 1, W), float(W))
        h = _where_gate(gate, jnp.clip(jnp.round(jnp.sqrt(area / r)), 1, H), float(H))
        top = _where_gate(gate, jax.random.uniform(k3, (n,)) * (H - h), 0.0)
        left = _where_gate(gate, jax.random.uniform(k4, (n,)) * (W - w), 0.0)
    sx = w / ow
    sy = h / oh
    return jax.vmap(_mat)(sx, sy, left + 0.5 * sx - 0.5, top + 0.5 * sy - 0.5)


def random_rotation_mats(key, n: int, degrees: float, hw: Tuple[int, int],
                         p: float = 1.0) -> Array:
    H, W = hw
    k0, k1 = jax.random.split(key)
    theta = jax.random.uniform(k1, (n,), minval=-degrees, maxval=degrees) * jnp.pi / 180.0
    theta = _where_gate(_gate(k0, p, n), theta, 0.0)
    return jax.vmap(lambda t: _rot_mat(t, (W - 1) / 2.0, (H - 1) / 2.0))(theta)


def random_affine_mats(
    key, n: int, hw: Tuple[int, int],
    translate: Tuple[float, float] = (0.0, 0.0),
    scale: Optional[Tuple[float, float]] = None,
    degrees: float = 0.0,
    p: float = 1.0,
) -> Array:
    """torchvision RandomAffine (translate fractions, uniform scale, optional rotation)."""
    H, W = hw
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    gate = _gate(k0, p, n)
    tx = jax.random.uniform(k1, (n,), minval=-translate[0], maxval=translate[0]) * W
    ty = jax.random.uniform(k2, (n,), minval=-translate[1], maxval=translate[1]) * H
    s = (jax.random.uniform(k3, (n,), minval=scale[0], maxval=scale[1])
         if scale is not None else jnp.ones((n,)))
    tx = _where_gate(gate, tx, 0.0)
    ty = _where_gate(gate, ty, 0.0)
    s = _where_gate(gate, s, 1.0)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    # inverse of (scale about center, then translate): in = (out - t - c)/s + c
    m = jax.vmap(_mat)(1.0 / s, 1.0 / s, cx - (cx + tx) / s, cy - (cy + ty) / s)
    if degrees:
        m = jnp.einsum("nij,njk->nik", m,
                       random_rotation_mats(k4, n, degrees, hw, p))
    return m


def time_warp_mats(key, n: int, min_factor: float, max_factor: float,
                   p: float = 1.0) -> Array:
    """TimeWarpWithStretch (get_data.py:29-58): torchaudio TimeStretch on a zero-phase
    complex spectrogram + abs + pad/trim. On zero-phase input the vocoder magnitude
    reduces to linear interpolation of columns at positions t*rate, so the exact
    fixed-shape equivalent is an x-scale about the origin with zero fill."""
    k0, k1 = jax.random.split(key)
    rate = jax.random.uniform(k1, (n,), minval=min_factor, maxval=max_factor)
    rate = _where_gate(_gate(k0, p, n), rate, 1.0)
    zeros = jnp.zeros((n,))
    return jax.vmap(_mat)(rate, jnp.ones((n,)), zeros, zeros)


# ----------------------------- pixel-space ops (batched) -----------------------------


def axis_mask(imgs: Array, key, mask_param: float, axis: int) -> Array:
    """torchaudio Frequency/TimeMasking: width ~ U(0, param), start ~ U(0, size-width),
    zero the band. axis=1 masks rows (frequency), axis=2 masks columns (time)."""
    n = imgs.shape[0]
    size = imgs.shape[axis]
    k1, k2 = jax.random.split(key)
    v = jax.random.uniform(k1, (n,)) * mask_param
    start = jax.random.uniform(k2, (n,)) * (size - v)
    idx = jax.lax.broadcasted_iota(jnp.float32, imgs.shape, axis)
    shape = [n, 1, 1]
    keep = (idx < start.reshape(shape)) | (idx >= (start + v).reshape(shape))
    return imgs * keep


def gaussian_noise(imgs: Array, key, std: float) -> Array:
    """GaussianNoise (get_data.py:21-27)."""
    return imgs + jax.random.normal(key, imgs.shape) * std


def grouped_masking(imgs: Array, key, mask_ratio: float, group_size: int = 4) -> Array:
    """GroupedMasking (get_data.py:60-108): zero exactly int(ratio*G) of the
    (H/g)x(W/g) patch groups per sample (randperm -> uniform-score threshold)."""
    keep = grouped_mask_batch(key, imgs.shape, mask_ratio, group_size)
    return imgs * keep


def grouped_mask_batch(key, batch_shape: Tuple[int, int, int], mask_ratio: float,
                       group_size: int = 4) -> Array:
    """Batched keep-mask (B, H, W) float32, 0 at masked groups (also serves the masked
    autoencoders, autoencoder.ipynb cell 5)."""
    B, H, W = batch_shape
    gh, gw = H // group_size, W // group_size
    n = gh * gw
    k = int(mask_ratio * n)
    if k == 0:
        return jnp.ones((B, H, W), jnp.float32)
    scores = jax.random.uniform(key, (B, n))
    thresh = jnp.sort(scores, axis=1)[:, k - 1 : k]
    keep = (scores > thresh).astype(jnp.float32).reshape(B, gh, gw)
    return jnp.repeat(jnp.repeat(keep, group_size, axis=1), group_size, axis=2)


def random_erasing(imgs: Array, key, p: float, scale: Tuple[float, float],
                   ratio: Tuple[float, float] = (0.3, 3.3)) -> Array:
    """torchvision RandomErasing(value=0), single-shot box sample with clamping."""
    n, H, W = imgs.shape
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    area = H * W * jax.random.uniform(k1, (n,), minval=scale[0], maxval=scale[1])
    r = jnp.exp(jax.random.uniform(k2, (n,), minval=jnp.log(ratio[0]),
                                   maxval=jnp.log(ratio[1])))
    h = jnp.clip(jnp.round(jnp.sqrt(area * r)), 1, H - 1)
    w = jnp.clip(jnp.round(jnp.sqrt(area / r)), 1, W - 1)
    top = jnp.floor(jax.random.uniform(k3, (n,)) * (H - h + 1))
    left = jnp.floor(jax.random.uniform(k4, (n,)) * (W - w + 1))
    ys = jax.lax.broadcasted_iota(jnp.float32, imgs.shape, 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, imgs.shape, 2)
    sh = (n, 1, 1)
    inside = ((ys >= top.reshape(sh)) & (ys < (top + h).reshape(sh))
              & (xs >= left.reshape(sh)) & (xs < (left + w).reshape(sh)))
    erased = jnp.where(inside, 0.0, imgs)
    apply = jax.random.bernoulli(k0, p, (n,))
    return jnp.where(apply.reshape(sh), erased, imgs)


def _sep_blur(imgs: Array, ky: Array, kx: Array) -> Array:
    """Separable blur via depthwise conv; ky/kx 1-D kernels (broadcast or per-sample)."""
    n, H, W = imgs.shape
    x = imgs[..., None]  # NHWC
    kh = ky.shape[-1]
    kw = kx.shape[-1]
    if ky.ndim == 1:
        x = jax.lax.conv_general_dilated(
            x, ky.reshape(kh, 1, 1, 1), (1, 1), [(kh // 2, kh // 2), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(
            x, kx.reshape(1, kw, 1, 1), (1, 1), [(0, 0), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x[..., 0]
    # per-sample kernels: small kh/kw — expand as weighted shifts
    pad_y = jnp.pad(imgs, ((0, 0), (kh // 2, kh // 2), (0, 0)), mode="edge")
    out = sum(pad_y[:, i : i + H, :] * ky[:, i, None, None] for i in range(kh))
    pad_x = jnp.pad(out, ((0, 0), (0, 0), (kw // 2, kw // 2)), mode="edge")
    return sum(pad_x[:, :, i : i + W] * kx[:, i, None, None] for i in range(kw))


def gaussian_blur3(imgs: Array, key, sigma: Tuple[float, float] = (0.1, 0.5)) -> Array:
    """torchvision GaussianBlur(kernel_size=3) with per-sample sigma ~ U(range)."""
    n = imgs.shape[0]
    s = jax.random.uniform(key, (n,), minval=sigma[0], maxval=sigma[1])
    x = jnp.array([-1.0, 0.0, 1.0])
    k = jnp.exp(-(x[None, :] ** 2) / (2.0 * s[:, None] ** 2))
    k = k / k.sum(axis=1, keepdims=True)
    return _sep_blur(imgs, k, k)


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return k / k.sum()


def elastic_displacement(key, shape: Tuple[int, int, int], alpha: float = 20.0,
                         sigma: float = 3.0, p: float = 1.0) -> Tuple[Array, Array]:
    """torchvision ElasticTransform displacement approximation: smooth random field
    (uniform noise, separable gaussian blur, scaled by alpha/size). Per-sample
    RandomApply(p) gates the field to zero. Returns (dy, dx) of shape (N, H, W)."""
    n, H, W = shape
    k0, k1, k2 = jax.random.split(key, 3)
    radius = int(3 * sigma)
    kern = _gaussian_kernel1d(sigma, radius)
    dx = _sep_blur(jax.random.uniform(k1, (n, H, W), minval=-1.0, maxval=1.0),
                   kern, kern) * alpha / W
    dy = _sep_blur(jax.random.uniform(k2, (n, H, W), minval=-1.0, maxval=1.0),
                   kern, kern) * alpha / H
    if p < 1.0:
        gate = jax.random.bernoulli(k0, p, (n,))[:, None, None]
        dx = jnp.where(gate, dx, 0.0)
        dy = jnp.where(gate, dy, 0.0)
    return dy, dx


def elastic_transform(imgs: Array, key, alpha: float = 20.0, sigma: float = 3.0) -> Array:
    """Standalone elastic warp via the dense-einsum bilinear (small images) or 4-tap
    gather. Coordinates are built directly (never through constant identity matrices,
    which XLA:TPU const-folds pathologically slowly)."""
    n, H, W = imgs.shape
    dy, dx = elastic_displacement(key, imgs.shape, alpha, sigma)
    ys = jax.lax.broadcasted_iota(jnp.float32, (n, H, W), 1) + dy
    xs = jax.lax.broadcasted_iota(jnp.float32, (n, H, W), 2) + dx
    if H * W <= _DENSE_WARP_MAX_PIXELS:
        return _dense_bilinear(imgs, xs, ys, H, W)
    x0, y0 = jnp.floor(xs), jnp.floor(ys)
    wx, wy = xs - x0, ys - y0
    flat = imgs.reshape(n, H * W)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = (jnp.clip(yi, 0, H - 1) * W
               + jnp.clip(xi, 0, W - 1)).astype(jnp.int32).reshape(n, -1)
        v = jnp.take_along_axis(flat, idx, axis=1).reshape(n, H, W)
        return jnp.where(valid, v, 0.0)

    return (tap(y0, x0) * (1 - wx) * (1 - wy)
            + tap(y0, x0 + 1) * wx * (1 - wy)
            + tap(y0 + 1, x0) * (1 - wx) * wy
            + tap(y0 + 1, x0 + 1) * wx * wy)


def maybe_pixel(key, p: float, fn, imgs: Array, *args) -> Array:
    """Per-sample RandomApply for a pixel op (both branches computed; XLA fuses)."""
    k_gate, k_op = jax.random.split(key)
    out = fn(imgs, k_op, *args)
    if p >= 1.0:
        return out
    gate = jax.random.bernoulli(k_gate, p, (imgs.shape[0],))
    return jnp.where(gate[:, None, None], out, imgs)


# ------------- single-image compatibility wrappers (tests / ad-hoc use) -------------


def affine_bilinear(img: Array, mat: Array, out_shape=None) -> Array:
    """Single-image general affine resample (batched gather under the hood)."""
    return batched_affine_gather(img[None], mat[None], out_shape)[0]
