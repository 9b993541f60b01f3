"""Full-pipeline integration: generate dataset artifacts (FSDD-like corpus ->
spectrogram memmaps) -> load through the standard reader -> train an SSL objective ->
probe. Exercises the same path a user would run end to end."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def generated_dataset(tmp_path_factory):
    from scipy.io import wavfile

    from avmnist_tpu.dsp.audio_augment import AugmentationType
    from avmnist_tpu.dsp.generate import (
        esc50_files_by_category,
        fsdd_by_label,
        generate_augmented_npy,
        split_noise_categories,
    )

    root = tmp_path_factory.mktemp("pipeline")
    fsdd = root / "recordings"
    fsdd.mkdir()
    rng = np.random.default_rng(0)
    # distinct per-digit tones so the generated spectrograms carry class signal
    for digit in range(10):
        freq = 200.0 + 150.0 * digit
        for sample in range(8):
            n = 3000
            t = np.arange(n) / 8000.0
            w = (0.5 * np.sin(2 * np.pi * freq * t)
                 + 0.05 * rng.normal(size=n)) * 20000
            wavfile.write(str(fsdd / f"{digit}_spk_{sample}.wav"), 8000,
                          w.astype(np.int16))
    esc = root / "esc50"
    (esc / "meta").mkdir(parents=True)
    (esc / "audio").mkdir()
    rows = ["filename,category"]
    for cat in ["dog", "rain", "wind", "fire", "sea", "cat"]:
        name = f"{cat}_0.wav"
        wavfile.write(str(esc / "audio" / name), 8000,
                      (rng.normal(size=4000) * 2000).astype(np.int16))
        rows.append(f"{name},{cat}")
    (esc / "meta" / "esc50.csv").write_text("\n".join(rows))

    data_dir = root / "avmnist"
    (data_dir / "image").mkdir(parents=True)
    (data_dir / "audio").mkdir()
    train_audio, test_audio = fsdd_by_label(str(fsdd))
    cats = esc50_files_by_category(str(esc))
    train_noise, test_noise = split_noise_categories(cats)

    from avmnist_tpu.data.synthetic import _class_pattern, _make_templates

    for split, n, audio_map, noise in (("train", 120, train_audio, train_noise),
                                       ("test", 40, test_audio, test_noise)):
        labels = np.random.default_rng(1).integers(0, 10, n)
        np.save(str(data_dir / f"{split}_labels.npy"), labels)
        templates = _make_templates(np.random.default_rng(42), (28, 28))
        np.save(str(data_dir / "image" / f"{split}_data.npy"),
                _class_pattern(np.random.default_rng(2), labels, templates
                               ).astype(np.float64))
        generate_augmented_npy(
            labels, audio_map, noise,
            str(data_dir / "audio" / f"{split}_data_augmented_burst_noise.npy"),
            AugmentationType.BURST_NOISE)
    return str(data_dir)


@pytest.mark.slow
def test_generated_dataset_trains_and_probes(generated_dataset):
    import jax

    from avmnist_tpu.data import Batches, load_avmnist, split_train_val
    from avmnist_tpu.eval.probes import knn_probe
    from avmnist_tpu.objectives.infonce import InfoNCEConfig, make_infonce_objective
    from avmnist_tpu.train.experiment import _probe_features
    from avmnist_tpu.train.loops import fit

    train = load_avmnist(generated_dataset, "train")
    test = load_avmnist(generated_dataset, "test")
    assert len(train) == 120 and len(test) == 40
    assert int(np.asarray(train.audio).max()) > 0
    train_split, val_split = split_train_val(train, 100, 20, seed=1)

    obj = make_infonce_objective(InfoNCEConfig(output_dim=32, projection_dim=16,
                                               learning_rate=1e-3))
    state, hist = fit(obj, train_split, epochs=2, batch_size=20, seed=1)
    assert np.isfinite(hist[-1]["train_loss"])

    fn = obj.meta["feature_fns"]["audio"]
    tf, tl = _probe_features(obj, state, train_split, feature_fn=fn)
    sf, sl = _probe_features(obj, state, test, feature_fn=fn)
    knn = knn_probe(tf, tl, sf, sl, k=5)
    # tone frequencies are class-determined -> spectrogram kNN should beat chance
    assert knn["accuracy"] > 20.0
