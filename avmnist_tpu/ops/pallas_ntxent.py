"""Pallas TPU kernel: fused NT-Xent logits (normalize + similarity + diagonal mask).

The contrastive hot op shared by SimCLR/InfoNCE: L2-normalize the 2B stacked
projections, form the 2B x 2B cosine-similarity matrix on the MXU, scale by 1/T and
mask the diagonal with -inf — one VMEM-resident kernel instead of four XLA ops.
(The CE over the logits stays in XLA: it is fused into the surrounding graph anyway.)

For typical sizes (2B <= 4096, P <= 256) the whole problem fits in one VMEM block.
Falls back to interpret mode off-TPU; tests assert equality with the jnp path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rows_ref, all_ref, out_ref, *, inv_temp: float, tr: int):
    """One (TR, N) output row-block: normalize both operands in VMEM, MXU matmul,
    diag mask offset by the block's global row start. Row-blocking keeps the f32
    sim block under VMEM even at 2B=2048+ (a single (2B, 2B) block OOMs at 16.9 MB)."""
    i = pl.program_id(0)
    r = rows_ref[:]
    a = all_ref[:]
    r = r * jax.lax.rsqrt(jnp.sum(r * r, axis=1, keepdims=True) + 1e-24)
    a = a * jax.lax.rsqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-24)
    sim = jnp.dot(r, a.T, preferred_element_type=jnp.float32) * inv_temp
    n = sim.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (tr, n), 0) + i * tr
    col = jax.lax.broadcasted_iota(jnp.int32, (tr, n), 1)
    out_ref[:, :] = jnp.where(row == col, -jnp.inf, sim)


def _row_tile(n: int) -> Optional[int]:
    """Largest row tile <=256 on the x8 ladder that divides n, or None when no
    tile divides n (e.g. 2B=998). None means "don't run the pallas kernel":
    emitting a single full-size (n, n) block would reintroduce the exact VMEM
    blow-up the row tiling exists to avoid, so the caller falls back to the XLA
    chain instead (ADVICE r2)."""
    tr = min(256, n)
    while tr > 8 and n % tr:
        tr -= 8
    return tr if n % tr == 0 else None


def _xla_masked_logits(reps: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """Reference XLA chain (normalize -> matmul -> diag mask) — the fallback when
    no row tile divides 2B, and the numeric oracle in tests."""
    r = reps.astype(jnp.float32)
    z = r * jax.lax.rsqrt(jnp.sum(r * r, axis=1, keepdims=True) + 1e-24)
    sim = (z @ z.T) / temperature
    return jnp.where(jnp.eye(sim.shape[0], dtype=bool), -jnp.inf, sim)


def nt_xent_logits_pallas(reps: jnp.ndarray, temperature: float = 0.07,
                          interpret: bool | None = None) -> jnp.ndarray:
    """(2B, P) projections -> (2B, 2B) masked similarity logits."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, p = reps.shape
    tr = _row_tile(n)
    if tr is None:
        return _xla_masked_logits(reps, temperature)
    kernel = functools.partial(_kernel, inv_temp=1.0 / temperature, tr=tr)
    return pl.pallas_call(
        kernel,
        grid=(n // tr,),
        in_specs=[pl.BlockSpec((tr, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, p), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tr, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    )(reps.astype(jnp.float32), reps.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def nt_xent_logits(reps: jnp.ndarray, temperature: float = 0.07) -> jnp.ndarray:
    """Differentiable wrapper: pallas forward (measured 1.10x vs the XLA chain
    at 2Bx P = 512x128 on v5e, docs/PERF_NOTES.md), analytic XLA backward.

    With z = reps / ||reps|| and S = (z z^T)/T (diag masked to -inf, cotangent
    zero there since softmax assigns it probability 0):
        dL/dz = (G + G^T) @ z / T,   dL/dreps = (dL/dz - z (dL/dz . z)) / ||reps||
    """
    return nt_xent_logits_pallas(reps, temperature)


def _ntx_fwd(reps, temperature):
    return nt_xent_logits_pallas(reps, temperature), reps


def _ntx_bwd(temperature, reps, g):
    r = reps.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(r * r, axis=1, keepdims=True) + 1e-24)
    z = r / norm
    g = jnp.where(jnp.isfinite(g), g, 0.0)
    gz = (g + g.T) @ z / temperature
    dr = (gz - z * jnp.sum(gz * z, axis=1, keepdims=True)) / norm
    return (dr.astype(reps.dtype),)


nt_xent_logits.defvjp(_ntx_fwd, _ntx_bwd)
