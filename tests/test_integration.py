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


def test_save_last_resume_is_exact(tmp_path):
    """Mid-run checkpoint/resume (train/checkpoint.py save_last/load_last):
    a run killed after epoch 2 and resumed from `last` must produce the SAME
    final state as an uninterrupted run — the resident path's epoch plans are
    pure functions of (seed, epoch), so the continuation is bit-exact.
    (Beyond the reference: SURVEY.md §5 'no mid-epoch resume anywhere'.)"""
    import jax

    from avmnist_tpu.data.resident import ResidentSplit
    from avmnist_tpu.data.synthetic import make_synthetic_avmnist
    from avmnist_tpu.objectives.supervised import make_centralnet_objective
    from avmnist_tpu.train.checkpoint import load_last, save_last
    from avmnist_tpu.train.loops import fit

    train, _ = make_synthetic_avmnist(n_train=32, n_test=8, seed=0)
    res = ResidentSplit(train)
    obj = make_centralnet_objective(channels=4, compute_dtype=jax.numpy.float32)

    # uninterrupted 4-epoch run
    state_a, _ = fit(obj, res, epochs=4, batch_size=8, seed=1)

    # interrupted run: 2 epochs with a rolling `last` checkpoint...
    ckpt_dir = str(tmp_path / "ckpt")
    fit(obj, res, epochs=2, batch_size=8, seed=1,
        checkpoint_hook=lambda e, st, rng: save_last(ckpt_dir, st, e, rng))
    # ...then resume from `last` and finish
    template = obj.init_fn(jax.random.key(0))
    state_r, last_epoch, rng, best = load_last(ckpt_dir, template)
    assert last_epoch == 1 and best is None
    state_b, hist = fit(obj, res, epochs=4, batch_size=8, seed=1,
                        state=state_r, start_epoch=last_epoch + 1, rng=rng)
    assert [h["epoch"] for h in hist] == [2, 3]

    flat_a = jax.tree.leaves(jax.device_get(state_a.params))
    flat_b = jax.tree.leaves(jax.device_get(state_b.params))
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)

    # A half-written checkpoint (SIGKILL mid orbax save leaves the dir without
    # the finalize marker) must read as ABSENT, not crash the resume
    # (checkpoint.is_finalized; ADVICE r3).
    from avmnist_tpu.train.checkpoint import is_finalized

    last_dir = os.path.join(ckpt_dir, "last")
    assert is_finalized(last_dir)
    os.remove(os.path.join(last_dir, "_CHECKPOINT_METADATA"))
    assert not is_finalized(last_dir)
    assert load_last(ckpt_dir, template) is None
