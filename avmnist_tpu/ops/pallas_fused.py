"""Fused BatchNorm-apply + ReLU + MaxPool2 epilogue as lane-packed Pallas kernels.

Why: in the reference's conv blocks (conv -> BN -> ReLU -> maxpool2, dino.py:18-73),
XLA materializes every intermediate on the training path. An hlo_stats profile of the
audio-SimCLR step (B=1024 pairs, v5e, round 2) shows the epilogue dwarfs the convs:

    BN backward reductions/composes   16.3 ms
    maxpool fwd+bwd (select_and_scatter)  15.5 ms
    relu materialization (fwd)         9.1 ms
    convolutions fwd+bwd              25.3 ms   <- the only part that is real FLOPs

Everything except the convs is HBM bandwidth spent re-reading/re-writing the huge
pre-pool activations (L1 of the audio stem: 1024x112x112x32 bf16 = 822 MB per pass).

LANE PACKING (the round-2 redesign). A first NHWC-blocked attempt measured 8.6x
SLOWER than XLA: C=32 in the lane dimension gets padded to 128 by Mosaic, wasting
4x VMEM bandwidth (docs/PERF_NOTES.md). These kernels instead view the activation
as a dense 2D array (B*H, W*C) — a free row-major reshape — so every vreg lane
carries real data for ANY channel count:

- BN apply: per-channel scale/shift pre-tiled to a (1, W*C) lane vector.
- W-pool: ``max(z, roll(z, -C lanes))`` — valid at even w-chunks.
- H-pool: row-pair max (h is even in every stem, so pairs never straddle images).
- first-max tie-break (select_and_scatter semantics) via lane/row parity masks +
  rolls; no gathers, no scatters, no strided slices.
- The pooled output keeps the sparse (every other w-chunk) lane layout in-kernel;
  one XLA slice compacts it outside — cheaper than an in-kernel lane unzip.

The custom_vjp boundary is f(y, gamma, beta) with batch statistics computed inside
(XLA moments), exactly flax.linen.BatchNorm's train-mode math (momentum handled by
the caller). mean/var are returned as auxiliary outputs for running-stat updates;
their cotangents are treated as zero (running stats are non-differentiated state).
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
ROWS = 64  # row-pairs per grid block (each block row = TWO image rows in lanes)


def fused_enabled() -> bool:
    """Whether ConvBNRelu routes its train-mode epilogue through the fused Pallas
    kernels. Env ``AVMNIST_PALLAS_FUSED`` opts in/out; see docs/PERF_NOTES.md for
    the measured A/B on v5e."""
    mode = os.environ.get("AVMNIST_PALLAS_FUSED", "0").lower()
    return mode in ("1", "true", "on")


def _roll(x, shift: int, axis: int):
    """jnp.roll semantics (out[i] = in[i - shift]); negative shifts wrapped for
    pltpu.roll which wants non-negative."""
    if _INTERPRET:
        return jnp.roll(x, shift, axis)
    n = x.shape[axis]
    return pltpu.roll(x, shift % n, axis)


def _lane_chunk_parity(L: int, C: int):
    """(1, L) f32 mask: 1.0 where the w-chunk index (lane // C) is odd."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    return ((lane // C) % 2).astype(jnp.float32)


def _fwd_kernel(x_ref, scale_ref, shift_ref, out_ref, *, C: int):
    # Block row = TWO image rows side by side in lanes: x (R, 2L). The H-pool is
    # a lane-half max (vreg-aligned slices, no sublane shuffles at all).
    x = x_ref[...].astype(jnp.float32)
    L = scale_ref.shape[1]
    s, t = scale_ref[...], shift_ref[...]
    zt = jnp.maximum(x[:, :L] * s + t, 0.0)
    zb = jnp.maximum(x[:, L:] * s + t, 0.0)
    p = jnp.maximum(jnp.maximum(zt, _roll(zt, -C, 1)),
                    jnp.maximum(zb, _roll(zb, -C, 1)))
    out_ref[...] = p.astype(out_ref.dtype)  # valid at even w-chunks


def _window_ctx(x, g, scale_ref, shift_ref, C: int):
    """Shared bwd recompute in the lane-pair layout: returns (dz_t, dz_b) — the
    pre-relu grads of the top/bottom image rows — with first-max (row-major
    window order: (t,w0) < (t,w1) < (b,w0) < (b,w1)) tie-breaking."""
    L = scale_ref.shape[1]
    s, t = scale_ref[...], shift_ref[...]
    zt = jnp.maximum(x[:, :L] * s + t, 0.0)
    zb = jnp.maximum(x[:, L:] * s + t, 0.0)
    m = jnp.maximum(jnp.maximum(zt, _roll(zt, -C, 1)),
                    jnp.maximum(zb, _roll(zb, -C, 1)))  # window max at even chunks
    ch = _lane_chunk_parity(L, C)

    def widen(a):  # valid-at-even-chunks -> every chunk holds its window value
        return jnp.where(ch > 0, _roll(a, C, 1), a)

    m_w = widen(m)
    g_w = widen(g)
    raw_t = ((zt == m_w) & (m_w > 0.0)).astype(jnp.float32)
    raw_b = ((zb == m_w) & (m_w > 0.0)).astype(jnp.float32)
    # earlier candidates, row-major: top-w0, top-w1, bottom-w0, bottom-w1
    pre_t = _roll(raw_t, C, 1) * ch
    win_t = jnp.where(ch > 0, raw_t + _roll(raw_t, C, 1),
                      raw_t + _roll(raw_t, -C, 1))
    pre_b = win_t + _roll(raw_b, C, 1) * ch
    dz_t = g_w * raw_t * (pre_t == 0.0).astype(jnp.float32)
    dz_b = g_w * raw_b * (pre_b == 0.0).astype(jnp.float32)
    return dz_t, dz_b


def _bwd1_kernel(x_ref, g_ref, scale_ref, shift_ref, mean_ref, rstd_ref,
                 sdz_ref, sdzy_ref, *, C: int):
    # Every grid cell maps to the SAME (8, L) output block (revisited output stays
    # resident in VMEM across the sequential TPU grid) -> accumulate into row 0.
    @pl.when(pl.program_id(0) == 0)
    def _():
        sdz_ref[...] = jnp.zeros_like(sdz_ref)
        sdzy_ref[...] = jnp.zeros_like(sdzy_ref)

    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    dz_t, dz_b = _window_ctx(x, g, scale_ref, shift_ref, C)
    L = dz_t.shape[1]
    yhat_t = (x[:, :L] - mean_ref[...]) * rstd_ref[...]
    yhat_b = (x[:, L:] - mean_ref[...]) * rstd_ref[...]
    sdz_ref[0, :] += jnp.sum(dz_t + dz_b, axis=0)
    sdzy_ref[0, :] += jnp.sum(dz_t * yhat_t + dz_b * yhat_b, axis=0)


def _bwd2_kernel(x_ref, g_ref, scale_ref, shift_ref, mean_ref, rstd_ref,
                 mdz_ref, mdzy_ref, dy_ref, *, C: int):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    dz_t, dz_b = _window_ctx(x, g, scale_ref, shift_ref, C)
    L = dz_t.shape[1]
    yhat_t = (x[:, :L] - mean_ref[...]) * rstd_ref[...]
    yhat_b = (x[:, L:] - mean_ref[...]) * rstd_ref[...]
    dy_t = scale_ref[...] * (dz_t - mdz_ref[...] - yhat_t * mdzy_ref[...])
    dy_b = scale_ref[...] * (dz_b - mdz_ref[...] - yhat_b * mdzy_ref[...])
    dy_ref[...] = jnp.concatenate([dy_t, dy_b], axis=1).astype(dy_ref.dtype)


def _pack_vec(v, w: int):
    """(C,) per-channel -> (1, W*C) lane vector (channel varies fastest)."""
    return jnp.tile(v.astype(jnp.float32), w)[None, :]


def _vec_spec(L):
    return pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _row_block(rows_total: int) -> int:
    """Largest divisor of rows_total at most ROWS (each row is a full pair of
    image rows, so no parity constraint)."""
    r = min(ROWS, rows_total)
    while r > 1 and rows_total % r:
        r -= 1
    return max(r, 1)


def _specs(rows_pairs: int, L: int):
    rb = _row_block(rows_pairs)
    grid = (rows_pairs // rb,)
    x_spec = pl.BlockSpec((rb, 2 * L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((rb, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return grid, x_spec, g_spec


def _sparse_to_dense(out_sparse, b, h, w, c):
    """(B*H/2, W*C) sparse pooled rows -> (B, H/2, W/2, C)."""
    return out_sparse.reshape(b, h // 2, w // 2, 2, c)[:, :, :, 0, :]


def _dense_to_sparse(g, b, h, w, c):
    """(B, H/2, W/2, C) pooled grads -> (B*H/2, W*C) with zeros at odd w-chunks."""
    gs = jnp.zeros((b, h // 2, w // 2, 2, c), g.dtype).at[:, :, :, 0, :].set(g)
    return gs.reshape(b * h // 2, w * c)


def _fused_fwd_out(y, scale, shift):
    b, h, w, c = y.shape
    if h % 2 or w % 2:
        # torch floor-pooling on odd dims never occurs in the stems; the caller
        # (ConvBNRelu) must route odd shapes through the unfused path.
        raise ValueError(f"fused bn_relu_pool needs even H/W, got {y.shape}")
    L = w * c
    pairs = b * h // 2
    grid, x_spec, out_spec = _specs(pairs, L)
    out_sparse = pl.pallas_call(
        functools.partial(_fwd_kernel, C=c),
        grid=grid,
        in_specs=[x_spec, _vec_spec(L), _vec_spec(L)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((pairs, L), y.dtype),
        interpret=_INTERPRET,
    )(y.reshape(pairs, 2 * L), _pack_vec(scale, w), _pack_vec(shift, w))
    return _sparse_to_dense(out_sparse, b, h, w, c)


def _fused_bwd(y, g, scale, shift, mean, rstd) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (dy, sdz, sdzy): input grad + per-channel sums of dz and dz*yhat."""
    b, h, w, c = y.shape
    L = w * c
    pairs = b * h // 2
    grid, x_spec, g_spec = _specs(pairs, L)
    part_spec = pl.BlockSpec((8, L), lambda i: (0, 0), memory_space=pltpu.VMEM)
    X = y.reshape(pairs, 2 * L)
    G = _dense_to_sparse(g, b, h, w, c)
    vecs = [_pack_vec(scale, w), _pack_vec(shift, w),
            _pack_vec(mean, w), _pack_vec(rstd, w)]

    p1, p2 = pl.pallas_call(
        functools.partial(_bwd1_kernel, C=c),
        grid=grid,
        in_specs=[x_spec, g_spec] + [_vec_spec(L)] * 4,
        out_specs=(part_spec, part_spec),
        out_shape=(jax.ShapeDtypeStruct((8, L), jnp.float32),
                   jax.ShapeDtypeStruct((8, L), jnp.float32)),
        interpret=_INTERPRET,
    )(X, G, *vecs)
    # fold (W*C,) lane partials -> (C,) per-channel sums (tiny XLA reduction)
    sdz = p1[0].reshape(w, c).sum(axis=0)
    sdzy = p2[0].reshape(w, c).sum(axis=0)
    n = b * h * w
    dy = pl.pallas_call(
        functools.partial(_bwd2_kernel, C=c),
        grid=grid,
        in_specs=[x_spec, g_spec] + [_vec_spec(L)] * 6,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((pairs, 2 * L), y.dtype),
        interpret=_INTERPRET,
    )(X, G, *vecs, _pack_vec(sdz / n, w), _pack_vec(sdzy / n, w))
    return dy.reshape(b, h, w, c), sdz, sdzy


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
    scale = gamma.astype(jnp.float32) * rstd
    shift = beta.astype(jnp.float32) - mean * scale
    out = _fused_fwd_out(y, scale, shift)
    return (out, mean, var), (y, gamma, beta, mean, rstd)


def _bn_relu_pool_bwd(eps, res, cts):
    y, gamma, beta, mean, rstd = res
    g = cts[0]  # cotangents of mean/var are treated as zero (running stats)
    scale = gamma.astype(jnp.float32) * rstd
    shift = beta.astype(jnp.float32) - mean * scale
    dy, sdz, sdzy = _fused_bwd(y, g, scale, shift, mean, rstd)
    # d/dgamma sum dz*yhat; d/dbeta sum dz; dy handled in-kernel:
    #   dy = scale/n * (n*dz - sum dz - yhat * sum dz*yhat) with the standard
    #   batch-norm backward identity (means pre-divided before kernel 2).
    dgamma = sdzy.astype(gamma.dtype)
    dbeta = sdz.astype(beta.dtype)
    return dy.astype(y.dtype), dgamma, dbeta


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
