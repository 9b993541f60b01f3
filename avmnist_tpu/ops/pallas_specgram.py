"""Pallas TPU kernel: fused framing + Hann window + DFT + PSD for specgram.

The spectrogram generator's hot op (dsp/spectrogram.py step 1; reference
audio_gen.ipynb cell 7 runs it ~70000x through matplotlib). For NFFT=256 the rFFT is
expressed as TWO 256x129 matmuls against precomputed cos/sin DFT bases — a shape that
maps straight onto the MXU — so one kernel invocation per waveform does:

    HBM wave row -> VMEM -> frame gather (static strides) -> x Hann window
      -> frames @ DFT_cos, frames @ DFT_sin (MXU) -> re^2 + im^2, PSD scaling -> out

Everything stays in VMEM between stages (a (nf, 256) frame block is ~60 KB).
Falls back to interpret mode off-TPU; numerically identical to the jnp.fft path
(tests/test_ops.py asserts 1e-5 agreement).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NFFT = 256
HOP = 128
N_BINS = NFFT // 2 + 1  # 129


@functools.lru_cache(maxsize=4)
def _dft_bases(nfft: int = NFFT) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT bases: frames @ cos -> Re, frames @ sin -> -Im.

    The Hann window is folded into the bases so the kernel skips the elementwise
    multiply: (w*x) @ C == x @ (diag(w) C)."""
    t = np.arange(nfft)[:, None]
    k = np.arange(N_BINS)[None, :]
    ang = 2.0 * np.pi * t * k / nfft
    win = np.hanning(nfft)[:, None]
    return ((np.cos(ang) * win).astype(np.float32),
            (np.sin(ang) * win).astype(np.float32))


ROWS = 8  # TPU sublane tiling: waves blocked (8, N) per grid step


def _kernel(wave_ref, cos_ref, sin_ref, out_ref, *, nf: int, inv_norm: float):
    # Framing without gathers: with HOP = NFFT/2, frame i = hop-chunks (i, i+1), so
    #   frames @ B == chunks @ B[:HOP] + roll(chunks, -1) @ B[HOP:]
    # — two MXU matmuls over ALL rows' chunks at once, no slicing/concat (Mosaic
    # rejects concat of offset slices).
    rows, n = wave_ref.shape
    n_chunks = n // HOP
    chunks = wave_ref[:].reshape(rows * n_chunks, HOP)
    nxt = pltpu.roll(chunks, shift=rows * n_chunks - 1, axis=0)  # == jnp.roll(x, -1)
    # HIGHEST precision: this is the fidelity path — the TPU default (bf16 MXU
    # passes) loses ~3 decimal digits, visible after squaring near PSD cancellations.
    hi = jax.lax.Precision.HIGHEST
    re = (jnp.dot(chunks, cos_ref[:HOP, :], preferred_element_type=jnp.float32,
                  precision=hi)
          + jnp.dot(nxt, cos_ref[HOP:, :], preferred_element_type=jnp.float32,
                    precision=hi))
    im = (jnp.dot(chunks, sin_ref[:HOP, :], preferred_element_type=jnp.float32,
                  precision=hi)
          + jnp.dot(nxt, sin_ref[HOP:, :], preferred_element_type=jnp.float32,
                    precision=hi))
    psd = (re * re + im * im) * inv_norm
    # one-sided doubling except DC and Nyquist (mlab PSD semantics)
    k = jax.lax.broadcasted_iota(jnp.int32, psd.shape, 1)
    psd = jnp.where((k > 0) & (k < N_BINS - 1), psd * 2.0, psd)
    # rows are interleaved (row-major over chunks); frames i >= nf per wave are
    # wrap-around garbage — the out block keeps only the first nf per row.
    out_ref[:, :, :] = psd.reshape(ROWS, n_chunks, N_BINS)[:, :nf, :]


def psd_specgram_pallas(waves: jnp.ndarray, fs: float = 8000.0,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Batched PSD spectrograms: (B, N) float32 -> (B, 129, nf).

    Matches dsp.spectrogram.psd_specgram (transposed internally to (freq, time))."""
    b, n = waves.shape
    nf = (n - NFFT) // HOP + 1
    pad_n = (-n) % HOP  # kernel framing needs the wave length in whole hop chunks
    if pad_n:
        waves = jnp.pad(waves, ((0, 0), (0, pad_n)))
        n += pad_n
    pad = (-b) % ROWS
    if pad:
        waves = jnp.concatenate([waves, jnp.zeros((pad, n), waves.dtype)])
    bp = b + pad
    cos_b, sin_b = _dft_bases()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    inv_norm = float(1.0 / (fs * np.sum(np.hanning(NFFT) ** 2)))
    kernel = functools.partial(_kernel, nf=nf, inv_norm=inv_norm)
    out = pl.pallas_call(
        kernel,
        grid=(bp // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NFFT, N_BINS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NFFT, N_BINS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, nf, N_BINS), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, nf, N_BINS), jnp.float32),
        interpret=interpret,
    )(waves.astype(jnp.float32), jnp.asarray(cos_b), jnp.asarray(sin_b))
    return out[:b].swapaxes(1, 2)  # (B, 129, nf)
