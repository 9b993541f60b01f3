"""Batched TPU spectrogram rendering — the audio_gen rewrite's core kernel.

The reference's "spectrogram" is NOT a log-mel array: it is a matplotlib RENDERING
(audio_gen.ipynb cell 7): ``ax.specgram(NFFT=256, noverlap=128, cmap='gray_r')`` drawn
into a 112x112-pixel Agg canvas, red channel kept as uint8. Reverse-engineered pipeline
(validated pixel-exactly against matplotlib 3.x internals; see tests/test_dsp.py):

1. PSD: Hann(256) window, hop 128, |rfft|^2 / (Fs * sum(win^2)), x2 on interior bins
   (matplotlib.mlab._spectral_helper semantics) -> (129, n_frames).
2. Z = 10*log10(PSD); A = flipud(Z); vmin/vmax = A.min()/A.max().
3. gray_r colormap at DATA resolution (matplotlib picks interpolation_stage='rgba'
   because the y-axis downsamples 129 -> 112 < 3x): gray = 1 - floor(clip(v*256))/255.
4. Agg 'hanning' resample (radius-1 hann filter; stretched by the scale factor when
   downsampling; per-output-pixel weight normalization) to the INTERNAL out-shape
   matplotlib computes — usually 113x113 (the 112.0...01-px bbox is ceil'd), sometimes
   112 on one axis depending on extent float arithmetic; probed per frame-count.
5. uint8 truncation (to_rgba(bytes=True)) and crop of the bottom-left 112x112 of the
   canvas composite: final = u8[H-112:, :112].

Steps 1-5 are pure JAX: two small matmuls per image (the separable hanning resample)
ride the MXU, and a whole generation batch renders in one fused program instead of the
reference's ~70000 sequential matplotlib figure draws (SURVEY.md §3.2, CPU hot path).

Measured parity: >99% of pixels within +-1 uint8 level, max |diff| <= 3 (the residue
is Agg's fixed-point filter arithmetic vs our float weights).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NFFT = 256
HOP = 128
OUT = 112


def hann_window(n: int = NFFT) -> np.ndarray:
    """np.hanning (symmetric), matplotlib's window_hanning."""
    return np.hanning(n).astype(np.float32)


def n_frames(n_samples: int) -> int:
    return (n_samples - NFFT) // HOP + 1


def psd_specgram(wave: jnp.ndarray, fs: float = 8000.0) -> jnp.ndarray:
    """mlab.specgram PSD: wave (N,) -> (129, n_frames). Static-shape under jit."""
    win = jnp.asarray(hann_window())
    nf = n_frames(wave.shape[0])
    idx = jnp.arange(NFFT)[None, :] + HOP * jnp.arange(nf)[:, None]
    frames = wave[idx] * win
    spec = jnp.abs(jnp.fft.rfft(frames, axis=1)) ** 2
    spec = spec / (fs * jnp.sum(win**2))
    spec = spec.at[:, 1:-1].multiply(2.0)
    return spec.T  # (129, nf)


def _hanning_kernel(d: np.ndarray) -> np.ndarray:
    return np.where(np.abs(d) < 1.0, 0.5 + 0.5 * np.cos(np.pi * np.clip(d, -1.0, 1.0)), 0.0)


def resample_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Agg hanning-filter resample as an (n_out, n_in) weight matrix: radius-1 hann,
    stretched by 1/scale when downsampling, rows normalized (filternorm)."""
    s = n_out / n_in
    stretch = max(1.0 / s, 1.0)
    centers = (np.arange(n_out) + 0.5) / s - 0.5
    d = (centers[:, None] - np.arange(n_in)[None, :]) / stretch
    w = _hanning_kernel(d)
    return (w / w.sum(axis=1, keepdims=True)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def mpl_internal_shape(n_freq: int, nf: int) -> Tuple[int, int]:
    """The (H, W) matplotlib internally resamples to before the canvas crop.

    The axes bbox is 112.000...01 px; _make_image ceils non-integer sizes to 113 with
    a compensating scale, but whether each axis lands exactly on 112.0 depends on
    extent float arithmetic — so we probe matplotlib once per frame-count (geometry
    only; no per-image rendering). Falls back to (113, 113) without matplotlib.
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        fig.set_size_inches((OUT / fig.get_dpi(), OUT / fig.get_dpi()))
        ax = plt.Axes(fig, [0.0, 0.0, 1.0, 1.0])
        ax.set_axis_off()
        fig.add_axes(ax)
        # Dummy wave with the right frame count; specgram builds the exact extent.
        wave = np.zeros(NFFT + HOP * (nf - 1), np.float32)
        wave[::50] = 1.0
        *_, im = ax.specgram(wave, cmap="gray_r", NFFT=NFFT, Fs=8000, noverlap=HOP)
        fig.canvas.draw()
        img, *_ = im.make_image(fig.canvas.renderer, magnification=1.0)
        plt.close(fig)
        return img.shape[0], img.shape[1]
    except Exception:
        return (113, 113)


def render_gray_r(Z: jnp.ndarray, internal_hw: Tuple[int, int]) -> jnp.ndarray:
    """dB spectrogram (129, nf) -> uint8 canvas (112, 112), steps 2-5 above.

    Non-finite cells (10*log10(0) = -inf from waveform time masks) follow matplotlib's
    masked-invalid path: excluded from the vmin/vmax autoscale, drawn as gray_r's
    fully-transparent "bad" color, and src-over composited onto the white figure —
    so the red and alpha channels are resampled separately and blended here."""
    h, w = internal_hw
    wy = jnp.asarray(resample_matrix(Z.shape[0], h))
    wx = jnp.asarray(resample_matrix(Z.shape[1], w))
    a = Z[::-1]  # flipud
    bad = ~jnp.isfinite(a)
    vmin = jnp.where(bad, jnp.inf, a).min()
    vmax = jnp.where(bad, -jnp.inf, a).max()
    v = (a - vmin) / jnp.maximum(vmax - vmin, 1e-30)
    idx = jnp.clip(jnp.floor(jnp.where(bad, 0.0, v) * 256.0), 0, 255)
    g01 = jnp.where(bad, 0.0, 1.0 - idx / 255.0)  # bad color = (0,0,0,0)
    a01 = jnp.where(bad, 0.0, 1.0)
    red = jnp.clip(wy @ g01 @ wx.T, 0.0, 1.0)
    alpha = jnp.clip(wy @ a01 @ wx.T, 0.0, 1.0)
    r8 = jnp.floor(red * 255.0)
    a8 = jnp.floor(alpha * 255.0)
    # src-over onto the white canvas (figure facecolor), Agg uint8 blend.
    out = r8 * (a8 / 255.0) + 255.0 * (1.0 - a8 / 255.0)
    u8 = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return u8[h - OUT :, :OUT]


def wav_to_spectrogram(wave: jnp.ndarray, fs: float = 8000.0) -> jnp.ndarray:
    """Single-wave equivalent of audio_gen.ipynb cell 7's wav_to_spectrogram."""
    nf = n_frames(wave.shape[0])
    internal = mpl_internal_shape(NFFT // 2 + 1, nf)
    return render_gray_r(10.0 * jnp.log10(psd_specgram(wave, fs)), internal)


def specgram_pallas_enabled() -> bool:
    """Route the batched PSD stage through ops.pallas_specgram (fused framing +
    windowed-DFT matmuls + PSD in VMEM) instead of gather + jnp.fft. Opt-in via
    ``AVMNIST_PALLAS_SPECGRAM=1``; default OFF pending a measured win on the
    generation pipeline (the A/B is recorded in docs/PERF_NOTES.md)."""
    import os

    return os.environ.get("AVMNIST_PALLAS_SPECGRAM", "0").lower() in ("1", "true", "on")


@functools.partial(jax.jit, static_argnames=("fs", "internal_hw"))
def _batch_render(waves, fs, internal_hw):
    if specgram_pallas_enabled():
        from avmnist_tpu.ops.pallas_specgram import psd_specgram_pallas

        specs = psd_specgram_pallas(waves, fs)  # (B, 129, nf)
        return jax.vmap(
            lambda Z: render_gray_r(10.0 * jnp.log10(Z), internal_hw))(specs)

    def one(w):
        return render_gray_r(10.0 * jnp.log10(psd_specgram(w, fs)), internal_hw)

    return jax.vmap(one)(waves)


def wav_to_spectrogram_batch(waves: np.ndarray, fs: float = 8000.0) -> np.ndarray:
    """Batched renderer for same-length waves (B, N) -> (B, 112, 112) uint8.
    Generation code buckets files by frame count and calls this per bucket."""
    nf = n_frames(waves.shape[1])
    internal = mpl_internal_shape(NFFT // 2 + 1, nf)
    return np.asarray(jax.device_get(_batch_render(jnp.asarray(waves), fs, internal)))
