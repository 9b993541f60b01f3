import os

import numpy as np
import pytest

from avmnist_tpu.dsp.audio_augment import AugmentationType, augment_audio
from avmnist_tpu.dsp.generate import (
    belongs_to_train_audio,
    esc50_files_by_category,
    fsdd_by_label,
    generate_augmented_npy,
    split_noise_categories,
)


@pytest.fixture(scope="module")
def fake_corpus(tmp_path_factory):
    from scipy.io import wavfile

    root = tmp_path_factory.mktemp("corpus")
    fsdd = root / "recordings"
    fsdd.mkdir()
    rng = np.random.default_rng(0)
    for digit in range(10):
        for sample in range(8):
            n = int(rng.integers(2500, 5000))
            w = (rng.normal(size=n) * 8000).astype(np.int16)
            wavfile.write(str(fsdd / f"{digit}_speaker_{sample}.wav"), 8000, w)
    esc = root / "esc50"
    (esc / "meta").mkdir(parents=True)
    (esc / "audio").mkdir()
    rows = ["filename,category"]
    for cat in ["dog", "rain", "wind", "fire", "sea", "cat", "frog"]:
        for k in range(2):
            name = f"{cat}_{k}.wav"
            w = (rng.normal(size=4000) * 4000).astype(np.int16)
            wavfile.write(str(esc / "audio" / name), 44100 // 5, w)
            rows.append(f"{name},{cat}")
    (esc / "meta" / "esc50.csv").write_text("\n".join(rows))
    return str(fsdd), str(esc)


def test_fsdd_split_convention():
    assert not belongs_to_train_audio("7_jackson_4.wav")
    assert belongs_to_train_audio("7_jackson_5.wav")


def test_noise_split_deterministic(fake_corpus):
    _, esc = fake_corpus
    cats = esc50_files_by_category(esc)
    assert len(cats) == 7
    t1 = split_noise_categories(cats)
    t2 = split_noise_categories(cats)
    assert t1 == t2  # random.seed(0) parity
    assert len(t1[1]) == 10  # 5 test categories x 2 files


def test_augment_chain_all_schemes(fake_corpus):
    rng = np.random.default_rng(0)
    wave = rng.normal(size=3000).astype(np.float32)
    noise = rng.normal(size=4000).astype(np.float32)
    for scheme in AugmentationType:
        out, sr = augment_audio(wave, 8000, scheme, noise, 8820, rng)
        assert sr == 8000
        assert np.isfinite(out).all()
        assert len(out) >= 2048


def test_augment_pads_short_audio():
    out, _ = augment_audio(np.ones(100, np.float32), 8000,
                           AugmentationType.BURST_NOISE)
    assert len(out) == 2048


def test_generate_augmented_npy_artifact(fake_corpus, tmp_path):
    fsdd, esc = fake_corpus
    cats = esc50_files_by_category(esc)
    train_noise, _ = split_noise_categories(cats)
    train_audio, test_audio = fsdd_by_label(fsdd)
    assert all(len(v) == 3 for v in train_audio.values())  # samples 5,6,7
    assert all(len(v) == 5 for v in test_audio.values())   # samples 0..4
    labels = np.random.default_rng(1).integers(0, 10, 40)
    path = str(tmp_path / "audio" / "train_data_augmented_burst_noise.npy")
    generate_augmented_npy(labels, train_audio, train_noise, path,
                           AugmentationType.BURST_NOISE)
    # headerless raw memmap, uint8, (N, 112, 112)
    mm = np.memmap(path, mode="r", dtype=np.uint8, shape=(40, 112, 112))
    assert int(mm.max()) > 0
    # rows are distinct spectrograms
    assert not np.array_equal(np.asarray(mm[0]), np.asarray(mm[1]))
    with open(path, "rb") as f:
        assert f.read(6) != b"\x93NUMPY"


def test_synth_corpus_components(tmp_path):
    """Parity-corpus synthesizers: digit waves are class-structured, images are
    MNIST-contract float64 [0,255], ESC-50 meta layout parses."""
    from avmnist_tpu.dsp import synth_corpus as SC

    rng = np.random.default_rng(0)
    w0 = SC._digit_wave(0, 110.0, rng)
    w1 = SC._digit_wave(1, 110.0, rng)
    assert w0.dtype == np.int16 and len(w0) >= 2048 and len(w0) % 512 == 0
    # different digits -> different spectral envelopes (crude check)
    s0 = np.abs(np.fft.rfft(w0[:2048].astype(np.float64)))
    s1 = np.abs(np.fft.rfft(w1[:2048].astype(np.float64)))
    assert np.corrcoef(s0, s1)[0, 1] < 0.95

    esc = SC.synthesize_esc50(str(tmp_path / "esc"), files_per_category=1)
    cats = esc50_files_by_category(esc)
    assert len(cats) == 40 and all(len(v) == 1 for v in cats.values())

    labels = np.array([3, 7, 3])
    imgs = SC.synthesize_images(labels, seed=0)
    assert imgs.shape == (3, 28, 28) and imgs.dtype == np.float64
    assert imgs.max() <= 255.0 and imgs.max() > 50.0
    # same class, different warps
    assert not np.allclose(imgs[0], imgs[2])
