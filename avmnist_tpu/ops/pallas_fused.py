"""Fused BatchNorm-apply + ReLU + MaxPool2 epilogue as Pallas TPU kernels.

Why: in the reference's conv blocks (conv -> BN -> ReLU -> maxpool2, dino.py:18-73),
XLA materializes every intermediate on the training path. An hlo_stats profile of the
audio-SimCLR step (B=1024 pairs, v5e, round 2) shows the epilogue dwarfs the convs:

    BN backward reductions/composes   16.3 ms
    maxpool fwd+bwd (select_and_scatter)  15.5 ms
    relu materialization (fwd)         9.1 ms
    convolutions fwd+bwd              25.3 ms   <- the only part that is real FLOPs

Everything except the convs is HBM-bandwidth spent re-reading/re-writing the huge
pre-pool activations (L1: 2048x112x112x32 bf16 = 1.6 GB per pass). These kernels
fuse the entire epilogue so each pass reads the conv output exactly once:

- forward: out = maxpool2(relu(y * scale + shift)), one read of y, one write of y/4.
- backward pass 1: per-channel partial sums of dz and dz*yhat (recomputing z, the
  pool argmax, and the relu mask in VMEM) — one read of (y, g).
- backward pass 2: dy = scale * (dz - mean_dz - yhat * mean_dzy) — one read of
  (y, g), one write of dy.

The custom_vjp boundary is f(y, gamma, beta) with batch statistics computed inside
(XLA moments), exactly flax.linen.BatchNorm's train-mode math (momentum handled by
the caller). mean/var are returned as auxiliary outputs for running-stat updates;
their cotangents are treated as zero (running stats are non-differentiated state).

Tie-breaking matches XLA select_and_scatter: the FIRST maximum in row-major window
order receives the gradient.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU
_ENABLED_CACHE: dict = {}


def fused_enabled() -> bool:
    """Whether ConvBNRelu routes its train-mode epilogue through the fused Pallas
    kernels. Env ``AVMNIST_PALLAS_FUSED=1`` opts in; DEFAULT IS OFF.

    Measured on v5e (B=1024, 112x112x32 bf16, fwd+bwd): this kernel 115.6 ms vs
    XLA's 13.5 ms. Root cause: NHWC blocks put C=32 in the lane dimension, which
    Mosaic pads to 128 — 4x wasted VMEM bandwidth — and the f32 in-kernel
    temporaries double it. XLA's own layout freedom makes the unfused epilogue
    ~3x off speed-of-light already; beating it needs a (w, c)->(w/4, 128)
    lane-packed redesign (docs/PERF_NOTES.md), kept here for future work.
    A pure-XLA elementwise-VJP maxpool backward was also tried and measured
    0.26x of select_and_scatter at the same shape — XLA's TPU select_and_scatter
    is faster than its reputation; both negative results are recorded so they
    are not re-explored."""
    mode = os.environ.get("AVMNIST_PALLAS_FUSED", "0").lower()
    return mode in ("1", "true", "on")


def _pick_tiles(b: int, h: int, w: int, c: int) -> Tuple[int, int]:
    """(tb, ht): batch/height tile sizes. Mosaic pads the lane dim (C) to 128, so a
    whole 112x112x32 image block costs 6.4 MB as an f32 temporary — tile H (even
    tiles only, so pool windows and parity masks stay block-local) until one padded
    f32 block is ~<=1 MB, then grow the batch tile into the leftover budget."""
    cpad = -(-c // 128) * 128
    ht = h
    while (ht * w * cpad * 4 > 1024 * 1024
           and ht % 2 == 0 and (ht // 2) % 2 == 0 and h % (ht // 2) == 0):
        ht //= 2
    tb = max(1, (1024 * 1024) // (ht * w * cpad * 4))
    while b % tb:
        tb -= 1
    return tb, ht


def _quadrants(z):
    """(tb, h, w, c) -> the four 2x2-window corners, each (tb, h/2, w/2, c).
    Mosaic-safe: reshape-splits + scalar-index slices only (strided slices lower
    to >2D gathers, which Mosaic rejects)."""
    tb, h, w, c = z.shape
    zw = z.reshape(tb, h, w // 2, 2, c)
    zl, zr = zw[:, :, :, 0, :], zw[:, :, :, 1, :]

    def split_h(a):
        ah = a.reshape(tb, h // 2, 2, w // 2, c)
        return ah[:, :, 0], ah[:, :, 1]

    z00, z10 = split_h(zl)
    z01, z11 = split_h(zr)
    return z00, z01, z10, z11


def _up_rows(d, h):
    """(tb, h2, w2, c) -> (tb, h, w2, c), duplicating each row over its pair."""
    tb, h2, w2, c = d.shape
    return jnp.broadcast_to(d[:, :, None], (tb, h2, 2, w2, c)).reshape(tb, h, w2, c)


def _up_cols(d, w):
    """(tb, h, w2, c) -> (tb, h, w, c), duplicating each column over its pair."""
    tb, h, w2, c = d.shape
    return jnp.broadcast_to(d[:, :, :, None, :], (tb, h, w2, 2, c)).reshape(
        tb, h, w, c)


def _fwd_kernel(y_ref, scale_ref, shift_ref, out_ref):
    z = y_ref[...].astype(jnp.float32)
    z = jnp.maximum(z * scale_ref[0][None, None, None, :]
                    + shift_ref[0][None, None, None, :], 0.0)
    z00, z01, z10, z11 = _quadrants(z)
    out_ref[...] = jnp.maximum(jnp.maximum(z00, z01),
                               jnp.maximum(z10, z11)).astype(out_ref.dtype)


def _pool2(z):
    """(tb, h, w, c) max-pool 2x2 via reshape-split + scalar-index slices."""
    tb, h, w, c = z.shape
    zw = z.reshape(tb, h, w // 2, 2, c)
    zc = jnp.maximum(zw[:, :, :, 0, :], zw[:, :, :, 1, :])
    zh = zc.reshape(tb, h // 2, 2, w // 2, c)
    return jnp.maximum(zh[:, :, 0], zh[:, :, 1])


def _roll(x, axis, shift: int = 1):
    if _INTERPRET:
        return jnp.roll(x, shift, axis)
    return pltpu.roll(x, shift, axis)


def _recompute_dz(y, g, scale, shift):
    """dz (pre-relu grad of the BN output) from conv output y and pooled grad g,
    with first-max tie-breaking in row-major window order (select_and_scatter
    semantics). Mosaic-safe formulation: upsample the window max and pooled grad
    back to full resolution, mark max candidates with an equality mask, and clear
    every candidate that has an earlier candidate in its window via parity-masked
    rolls (no gather/scatter/strided slices, which Mosaic rejects in >2D)."""
    z = jnp.maximum(y * scale + shift, 0.0)
    h, w = y.shape[1], y.shape[2]
    m = _pool2(z)
    mu = _up_cols(_up_rows(m, h), w)
    gl = jnp.where(m > 0.0, g, 0.0)  # window max <= 0 -> relu kills the gradient
    glu = _up_cols(_up_rows(gl, h), w)
    raw = (z == mu).astype(jnp.float32)
    rpar = (jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1) % 2).astype(
        jnp.float32)
    cpar = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2) % 2).astype(
        jnp.float32)
    raw_l = _roll(raw, 2) * cpar                      # (r,1) <- (r,0)
    raw_u = _roll(raw, 1) * rpar                      # (1,c) <- (0,c)
    raw_ul = _roll(_roll(raw, 1), 2) * rpar * cpar    # (1,1) <- (0,0)
    # (1,0) <- (0,1): row-major order puts (0,1) BEFORE (1,0) in the window
    raw_ur = _roll(_roll(raw, 1), 2, shift=-1) * rpar * (1.0 - cpar)
    prefix = jnp.minimum(raw_l + raw_u + raw_ul + raw_ur, 1.0)
    return glu * raw * (1.0 - prefix)


def _bwd1_kernel(y_ref, g_ref, scale_ref, shift_ref, mean_ref, rstd_ref,
                 sdz_ref, sdzy_ref):
    # All grid cells map to the SAME (8, C) output block (revisited output stays
    # resident in VMEM across the sequential TPU grid) -> accumulate into row 0.
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        sdz_ref[...] = jnp.zeros_like(sdz_ref)
        sdzy_ref[...] = jnp.zeros_like(sdzy_ref)

    y = y_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    scale = scale_ref[0][None, None, None, :]
    shift = shift_ref[0][None, None, None, :]
    dz = _recompute_dz(y, g, scale, shift)
    yhat = (y - mean_ref[0][None, None, None, :]) * rstd_ref[0][None, None, None, :]
    sdz_ref[0, :] += jnp.sum(dz, axis=(0, 1, 2))
    sdzy_ref[0, :] += jnp.sum(dz * yhat, axis=(0, 1, 2))


def _bwd2_kernel(y_ref, g_ref, scale_ref, shift_ref, mean_ref, rstd_ref,
                 mdz_ref, mdzy_ref, dy_ref):
    y = y_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    scale = scale_ref[0][None, None, None, :]
    shift = shift_ref[0][None, None, None, :]
    dz = _recompute_dz(y, g, scale, shift)
    yhat = (y - mean_ref[0][None, None, None, :]) * rstd_ref[0][None, None, None, :]
    dy = scale * (dz - mdz_ref[0][None, None, None, :]
                  - yhat * mdzy_ref[0][None, None, None, :])
    dy_ref[...] = dy.astype(dy_ref.dtype)


def _row(v):  # (C,) f32 -> (1, C) for a clean VMEM layout
    return v.astype(jnp.float32)[None, :]


def _vec_spec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _vec_spec2(c):
    return pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)


def _img_specs(b, h, w, c):
    tb, ht = _pick_tiles(b, h, w, c)
    grid = (b // tb, h // ht)
    img = pl.BlockSpec((tb, ht, w, c), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    half = pl.BlockSpec((tb, ht // 2, w // 2, c), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    return grid, img, half


def _fused_fwd_out(y, scale, shift):
    b, h, w, c = y.shape
    grid, img_spec, half_spec = _img_specs(b, h, w, c)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[img_spec, _vec_spec2(c), _vec_spec2(c)],
        out_specs=half_spec,
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, c), y.dtype),
        interpret=_INTERPRET,
    )(y, _row(scale), _row(shift))


def _fused_bwd(y, g, scale, shift, mean, rstd) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (dy, sdz, sdzy) where sdz/sdzy are per-channel sums of dz and dz*yhat."""
    b, h, w, c = y.shape
    grid, img_spec, g_spec = _img_specs(b, h, w, c)
    part_spec = pl.BlockSpec((8, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    vecs = [_row(scale), _row(shift), _row(mean), _row(rstd)]

    p1, p2 = pl.pallas_call(
        _bwd1_kernel,
        grid=grid,
        in_specs=[img_spec, g_spec] + [_vec_spec2(c)] * 4,
        out_specs=(part_spec, part_spec),
        out_shape=(jax.ShapeDtypeStruct((8, c), jnp.float32),
                   jax.ShapeDtypeStruct((8, c), jnp.float32)),
        interpret=_INTERPRET,
    )(y, g, *vecs)
    sdz = p1[0]
    sdzy = p2[0]
    n = b * h * w
    dy = pl.pallas_call(
        _bwd2_kernel,
        grid=grid,
        in_specs=[img_spec, g_spec] + [_vec_spec2(c)] * 6,
        out_specs=img_spec,
        out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
        interpret=_INTERPRET,
    )(y, g, *vecs, _row(sdz / n), _row(sdzy / n))
    return dy, sdz, sdzy


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_relu_pool(y, gamma, beta, eps: float = 1e-5):
    """maxpool2(relu(batchnorm_train(y) * gamma + beta)) with batch statistics.

    Returns (out, mean, var); mean/var (f32, biased variance — flax convention) feed
    the caller's running-stat update and are NOT differentiated through.
    """
    out, mean, var = _bn_relu_pool_fwd(y, gamma, beta, eps)[0]
    return out, mean, var


def _moments(y):
    yf = y.astype(jnp.float32)
    mean = yf.mean(axis=(0, 1, 2))
    var = (yf * yf).mean(axis=(0, 1, 2)) - mean * mean
    return mean, jnp.maximum(var, 0.0)


def _bn_relu_pool_fwd(y, gamma, beta, eps):
    mean, var = _moments(y)
    rstd = jax.lax.rsqrt(var + eps)
    scale = (gamma.astype(jnp.float32) * rstd)
    shift = beta.astype(jnp.float32) - mean * scale
    out = _fused_fwd_out(y, scale, shift)
    return ((out, mean, var),
            (y, gamma.astype(jnp.float32), mean, var, rstd, scale, shift))


def _bn_relu_pool_bwd(eps, res, cts):
    y, gamma, mean, var, rstd, scale, shift = res
    g_out = cts[0]  # cotangents of mean/var are zero by contract
    dy, sdz, sdzy = _fused_bwd(y, g_out, scale, shift, mean, rstd)
    dgamma = sdzy.astype(gamma.dtype)
    dbeta = sdz.astype(gamma.dtype)
    return dy, dgamma, dbeta


bn_relu_pool.defvjp(_bn_relu_pool_fwd, _bn_relu_pool_bwd)


def bn_relu_pool_reference(y, gamma, beta, eps: float = 1e-5):
    """Plain-XLA reference implementation (numerics oracle for tests)."""
    yf = y.astype(jnp.float32)
    mean = yf.mean(axis=(0, 1, 2))
    var = jnp.maximum((yf * yf).mean(axis=(0, 1, 2)) - mean * mean, 0.0)
    z = (yf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    z = jnp.maximum(z, 0.0).astype(y.dtype)
    from flax import linen as nn

    return nn.max_pool(z, (2, 2), strides=(2, 2)), mean, var
