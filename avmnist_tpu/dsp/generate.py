"""Offline AVMNIST audio dataset generation (audio_gen.ipynb cells 2-9) — TPU-batched.

Same artifact contract as the reference: for each augmentation scheme, a headerless
uint8 memmap ``{save_dir}/audio/{train,test}_data_augmented_<scheme>.npy`` of shape
(len(labels), 112, 112), one row per MNIST label, pairing FSDD recordings (round-robin
per digit) with ESC-50 noise files (round-robin global).

Pipeline restructure: the reference renders ~70000 matplotlib figures sequentially
(SURVEY.md §3.2). Here waveform augmentation runs on host (numpy/scipy), waves are
BUCKETED BY FRAME COUNT, and each bucket renders as one batched TPU program
(dsp.spectrogram.wav_to_spectrogram_batch).

Split logic parity (cells 2-5): FSDD test = speaker-sample index <= 4; ESC-50 test =
5 categories drawn with ``random.seed(0)`` + ``random.sample`` (python stdlib RNG kept
for EXACT category-split parity with the reference).
"""
from __future__ import annotations

import os
import random
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from avmnist_tpu.dsp.audio_augment import (
    NOISE_SCHEMES,
    AugmentationType,
    augment_audio,
    load_wav,
)
from avmnist_tpu.dsp.spectrogram import HOP, NFFT, n_frames, wav_to_spectrogram_batch


def belongs_to_train_audio(filename: str) -> bool:
    """FSDD convention: sample index <= 4 is test (cell 4)."""
    idx = filename.rsplit("_", 1)[1].rsplit(".", 1)[0]
    return int(idx) > 4


def esc50_files_by_category(esc50_dir: str) -> Dict[str, List[str]]:
    """Group ESC-50 audio paths by category from meta/esc50.csv (cell 3)."""
    import csv

    by_cat: Dict[str, List[str]] = defaultdict(list)
    with open(os.path.join(esc50_dir, "meta", "esc50.csv")) as f:
        for row in csv.DictReader(f):
            by_cat[row["category"]].append(os.path.join(esc50_dir, "audio", row["filename"]))
    return dict(by_cat)


def split_noise_categories(names_by_cat: Dict[str, List[str]], seed: int = 0):
    """5 test categories via random.seed(0) + random.sample (cell 2+5, exact parity)."""
    random.seed(seed)
    test_cats = random.sample(list(names_by_cat.keys()), 5)
    train = [f for c, fs in names_by_cat.items() if c not in test_cats for f in fs]
    test = [f for c in test_cats for f in names_by_cat[c]]
    return train, test


def fsdd_by_label(audio_dir: str) -> Tuple[Dict[str, List[str]], Dict[str, List[str]]]:
    files = sorted(f for f in os.listdir(audio_dir) if f.endswith(".wav"))
    train: Dict[str, List[str]] = {str(i): [] for i in range(10)}
    test: Dict[str, List[str]] = {str(i): [] for i in range(10)}
    for f in files:
        label = f.split("_")[0]
        (train if belongs_to_train_audio(f) else test)[label].append(
            os.path.join(audio_dir, f))
    return train, test


def generate_augmented_npy(
    labels: np.ndarray,
    audio_by_label: Dict[str, List[str]],
    noise_files: Sequence[str],
    save_path: str,
    aug_type: AugmentationType = AugmentationType.BURST_NOISE,
    seed: int = 0,
    render_batch: int = 256,
) -> str:
    """Equivalent of cell 8's generate_augmented_npy, batched.

    Pass 1 (host): per-label round-robin FSDD file + round-robin noise file,
    waveform augmentation, collect (index, wave) bucketed by frame count.
    Pass 2 (TPU): per bucket, batched spectrogram render; rows written to the memmap.
    """
    if os.path.exists(save_path):
        return save_path
    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    rng = np.random.default_rng(seed)
    out = np.memmap(save_path, mode="w+", dtype=np.uint8,
                    shape=(len(labels), 112, 112))

    wave_cache: Dict[str, Tuple[np.ndarray, int]] = {}

    def cached(path):
        if path not in wave_cache:
            wave_cache[path] = load_wav(path)
        return wave_cache[path]

    # Noise files are reused round-robin across the whole dataset; pre-resampling them
    # to the FSDD rate once turns the host hot loop (one resample_poly per SAMPLE in a
    # naive port) into a dict lookup.
    noise_cache: Dict[Tuple[str, int], Tuple[np.ndarray, int]] = {}

    def cached_noise(path, target_sr):
        key = (path, target_sr)
        if key not in noise_cache:
            from avmnist_tpu.dsp.audio_augment import resample

            wave, sr = cached(path)
            noise_cache[key] = (resample(wave, sr, target_sr), target_sr)
        return noise_cache[key]

    audio_idx = [0] * 10
    max_idx = [len(audio_by_label[str(i)]) for i in range(10)]
    buckets: Dict[int, List[Tuple[int, np.ndarray]]] = defaultdict(list)

    for i, val in enumerate(np.asarray(labels).astype(int)):
        noise_path = (noise_files[i % len(noise_files)]
                      if aug_type in NOISE_SCHEMES and noise_files else None)
        audio_path = audio_by_label[str(val)][audio_idx[val]]
        audio_idx[val] = (audio_idx[val] + 1) % max_idx[val]
        wave, sr = cached(audio_path)
        noise, noise_sr = cached_noise(noise_path, sr) if noise_path else (None, None)
        aug, sr = augment_audio(wave, sr, aug_type, noise, noise_sr, rng)
        buckets[n_frames(len(aug))].append((i, aug))

    for nf, items in buckets.items():
        length = NFFT + HOP * (nf - 1)
        for start in range(0, len(items), render_batch):
            chunk = items[start : start + render_batch]
            waves = np.stack([w[:length] for _, w in chunk])
            specs = wav_to_spectrogram_batch(waves, fs=8000.0)
            for (row, _), spec in zip(chunk, specs):
                out[row] = spec
        out.flush()
    out.flush()
    return save_path


def generate_all(
    fsdd_dir: str,
    esc50_dir: str,
    save_dir: str,
    labels_dir: Optional[str] = None,
    schemes: Sequence[AugmentationType] = tuple(AugmentationType),
) -> List[str]:
    """Full cell-9 driver: all schemes x {train, test}."""
    labels_dir = labels_dir or save_dir
    names_by_cat = esc50_files_by_category(esc50_dir)
    train_noise, test_noise = split_noise_categories(names_by_cat)
    train_audio, test_audio = fsdd_by_label(fsdd_dir)
    outputs = []
    for scheme in schemes:
        for split, audio, noise in (("train", train_audio, train_noise),
                                    ("test", test_audio, test_noise)):
            labels = np.load(os.path.join(labels_dir, f"{split}_labels.npy"))
            path = os.path.join(save_dir, "audio",
                                f"{split}_data_augmented_{scheme.name.lower()}.npy")
            outputs.append(generate_augmented_npy(labels, audio, noise, path, scheme))
    return outputs
