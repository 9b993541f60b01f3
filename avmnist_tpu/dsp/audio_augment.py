"""Waveform-domain augmentation for dataset generation (audio_gen.ipynb cell 6).

Five schemes: EXTREME_NOISE, MULTI_BAND, BURST_NOISE (the one used by all committed
experiments), ALIASED, DISTORTED. Host-side numpy/scipy (this is the offline data-prep
path; the batched spectrogram render that dominates runtime is the TPU kernel in
spectrogram.py). librosa is replaced by scipy: wav IO via scipy.io.wavfile, resampling
via polyphase scipy.signal.resample_poly (librosa's soxr gives slightly different
interpolation; parity criterion for generation is distributional, the renderer is the
pixel-exact part).
"""
from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple

import numpy as np


class AugmentationType(enum.Enum):
    EXTREME_NOISE = "extreme_noise"
    MULTI_BAND = "multi_band"
    BURST_NOISE = "burst_noise"
    ALIASED = "aliased"
    DISTORTED = "distorted"


@dataclasses.dataclass
class AudioConfig:
    """Per-scheme parameters (audio_gen.ipynb cell 6 get_augmentation_config)."""

    snr_db: Optional[float] = None
    freq_mask_ratio: float = 0.0
    n_freq_masks: int = 1
    time_mask_ratio: float = 0.0
    n_time_masks: int = 1
    filter_bands: Optional[List[Tuple[float, float]]] = None
    downsample_factor: Optional[int] = None
    distortion_factor: Optional[float] = None


AUG_CONFIGS = {
    AugmentationType.EXTREME_NOISE: AudioConfig(snr_db=0, time_mask_ratio=0.1, n_time_masks=2),
    AugmentationType.MULTI_BAND: AudioConfig(freq_mask_ratio=0.2, n_freq_masks=3,
                                             filter_bands=[(50, 1000), (2000, 3500)]),
    AugmentationType.BURST_NOISE: AudioConfig(snr_db=3, time_mask_ratio=0.15, n_time_masks=4),
    AugmentationType.ALIASED: AudioConfig(downsample_factor=4, freq_mask_ratio=0.3),
    AugmentationType.DISTORTED: AudioConfig(distortion_factor=2.0, snr_db=5),
}

NOISE_SCHEMES = (AugmentationType.EXTREME_NOISE, AugmentationType.BURST_NOISE,
                 AugmentationType.DISTORTED)

# librosa.stft defaults used by the reference's frequency masks (n_fft=2048, hop=512).
_STFT_NFFT = 2048
_STFT_HOP = 512


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """librosa.load(sr=None) equivalent: native rate, float32 in [-1, 1], mono."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if data.dtype == np.int16:
        data = data / 32768.0
    elif data.dtype == np.int32:
        data = data / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    return data.astype(np.float32), int(sr)


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    from math import gcd

    from scipy.signal import resample_poly

    if orig_sr == target_sr:
        return x
    g = gcd(int(orig_sr), int(target_sr))
    return resample_poly(x, target_sr // g, orig_sr // g).astype(np.float32)


def _stft(x: np.ndarray) -> np.ndarray:
    n = _STFT_NFFT
    pad = n // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    nf = 1 + (len(xp) - n) // _STFT_HOP
    idx = np.arange(n)[None, :] + _STFT_HOP * np.arange(nf)[:, None]
    win = np.hanning(n + 1)[:-1].astype(np.float32)  # periodic hann (librosa)
    return np.fft.rfft(xp[idx] * win, axis=1).T  # (1025, nf)


def _istft(D: np.ndarray, length: int) -> np.ndarray:
    n = _STFT_NFFT
    win = np.hanning(n + 1)[:-1].astype(np.float32)
    frames = np.fft.irfft(D.T, n=n, axis=1) * win
    out = np.zeros(n + _STFT_HOP * (D.shape[1] - 1), np.float32)
    norm = np.zeros_like(out)
    for i, f in enumerate(frames):
        out[i * _STFT_HOP : i * _STFT_HOP + n] += f
        norm[i * _STFT_HOP : i * _STFT_HOP + n] += win**2
    out = out / np.maximum(norm, 1e-8)
    pad = n // 2
    return out[pad : pad + length]


def add_noise(samples: np.ndarray, noise: np.ndarray, noise_sr: int, sr: int,
              snr_db: float) -> np.ndarray:
    """RMS-scaled noise mix at target SNR (cell 6 add_noise)."""
    noise = resample(noise, noise_sr, sr)[: len(samples)]
    a_sig = np.sqrt(np.mean(samples**2))
    a_noise = np.sqrt(np.mean(noise**2))
    if a_noise != 0:
        target = a_sig / (10.0 ** (snr_db / 20.0))
        mixed = samples.copy()
        mixed[: len(noise)] = samples[: len(noise)] + noise * (target / a_noise)
        return mixed
    return samples


def apply_time_masks(samples: np.ndarray, ratio: float, n_masks: int,
                     rng: np.random.Generator) -> np.ndarray:
    out = samples.copy()
    m = int(len(out) * ratio)
    for _ in range(n_masks):
        start = int(rng.integers(0, len(out) - m + 1))
        out[start : start + m] = 0.0
    return out


def apply_frequency_masks(samples: np.ndarray, ratio: float, n_masks: int,
                          rng: np.random.Generator) -> np.ndarray:
    D = _stft(samples)
    nf = D.shape[0]
    m = int(nf * ratio)
    for _ in range(n_masks):
        start = int(rng.integers(0, nf - m + 1))
        D[start : start + m, :] = 0.0
    return _istft(D, len(samples))


def apply_band_filter(samples: np.ndarray, sr: int,
                      bands: List[Tuple[float, float]]) -> np.ndarray:
    D = _stft(samples)
    nf = D.shape[0]
    freqs = np.linspace(0, sr / 2, nf)
    keep = np.zeros(nf)
    for lo, hi in bands:
        keep[(freqs >= lo) & (freqs <= hi)] = 1.0
    return _istft(D * keep[:, None], len(samples))


def apply_distortion(samples: np.ndarray, factor: float) -> np.ndarray:
    return np.tanh(samples / (np.max(np.abs(samples)) + 1e-6) * factor)


def augment_audio(
    samples: np.ndarray,
    sr: int,
    aug_type: AugmentationType,
    noise: Optional[np.ndarray] = None,
    noise_sr: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, int]:
    """Full augmentation chain (cell 6 augment_audio), array-in/array-out."""
    rng = rng or np.random.default_rng()
    if len(samples) < 2048:
        samples = np.pad(samples, (0, 2048 - len(samples)))
    cfg = AUG_CONFIGS[aug_type]
    if aug_type in NOISE_SCHEMES and noise is not None:
        samples = add_noise(samples, noise, noise_sr or sr, sr, cfg.snr_db)
    if aug_type in (AugmentationType.EXTREME_NOISE, AugmentationType.BURST_NOISE):
        samples = apply_time_masks(samples, cfg.time_mask_ratio, cfg.n_time_masks, rng)
    if aug_type == AugmentationType.MULTI_BAND:
        samples = apply_frequency_masks(samples, cfg.freq_mask_ratio, cfg.n_freq_masks, rng)
        if cfg.filter_bands:
            samples = apply_band_filter(samples, sr, cfg.filter_bands)
    if aug_type == AugmentationType.ALIASED:
        samples = resample(resample(samples, sr, sr // cfg.downsample_factor),
                           sr // cfg.downsample_factor, sr)
        samples = apply_frequency_masks(samples, cfg.freq_mask_ratio, 1, rng)
    if aug_type == AugmentationType.DISTORTED:
        samples = apply_distortion(samples, cfg.distortion_factor)
    return samples.astype(np.float32), sr
