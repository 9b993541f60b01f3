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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(reps_ref, out_ref, *, inv_temp: float):
    reps = reps_ref[:]
    norm = jax.lax.rsqrt(jnp.sum(reps * reps, axis=1, keepdims=True) + 1e-24)
    z = reps * norm
    sim = jnp.dot(z, z.T, preferred_element_type=jnp.float32) * inv_temp
    n = sim.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    out_ref[:, :] = jnp.where(row == col, -jnp.inf, sim)


def nt_xent_logits_pallas(reps: jnp.ndarray, temperature: float = 0.07,
                          interpret: bool | None = None) -> jnp.ndarray:
    """(2B, P) projections -> (2B, 2B) masked similarity logits."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, p = reps.shape
    kernel = functools.partial(_kernel, inv_temp=1.0 / temperature)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    )(reps.astype(jnp.float32))
