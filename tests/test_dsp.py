"""Spectrogram fidelity tests: pixel parity against the reference matplotlib render
(audio_gen.ipynb cell 7). The golden generator below re-creates the reference's
figure-render path verbatim in behavior (it IS matplotlib; nothing is approximated on
the golden side)."""
import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from avmnist_tpu.dsp import psd_specgram, wav_to_spectrogram_batch  # noqa: E402


def golden_render(samples, sr=8000, dims=(112, 112), NFFT=256, noverlap=128):
    """The reference wav_to_spectrogram behavior (audio_gen.ipynb cell 7)."""
    fig = plt.figure()
    fig.set_size_inches((dims[0] / fig.get_dpi(), dims[1] / fig.get_dpi()))
    ax = plt.Axes(fig, [0.0, 0.0, 1.0, 1.0])
    ax.set_axis_off()
    fig.add_axes(ax)
    ax.specgram(samples, cmap="gray_r", NFFT=NFFT, Fs=sr, noverlap=noverlap)
    ax.xaxis.set_major_locator(plt.NullLocator())
    ax.yaxis.set_major_locator(plt.NullLocator())
    fig.canvas.draw()
    arr = np.array(fig.canvas.renderer.buffer_rgba())[:, :, 0]
    plt.close(fig)
    return arr


def make_wave(n, seed):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 40, n)
    return (rng.normal(size=n) * np.sin(t) + 0.3 * np.sin(37.0 * t)).astype(np.float32)


def test_psd_matches_mlab():
    from matplotlib import mlab

    w = make_wave(4000, 0)
    ours = np.asarray(psd_specgram(w, 8000.0))
    ref, freqs, t = mlab.specgram(w, NFFT=256, Fs=8000, noverlap=128)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-12)


@pytest.mark.parametrize("n", [2048, 3000, 4000, 6000, 8000])
def test_render_parity(n):
    w = make_wave(n, n)
    golden = golden_render(w).astype(int)
    mine = wav_to_spectrogram_batch(w[None, :])[0].astype(int)
    diff = np.abs(golden - mine)
    assert diff.max() <= 3, f"max pixel diff {diff.max()}"
    assert (diff > 1).mean() < 0.01, f"{(diff > 1).mean():.4f} of pixels off by >1"
    assert (diff == 0).mean() > 0.7  # remainder is +-1 Agg fixed-point noise


def test_render_parity_with_time_masks():
    """Time-masked waveforms produce zero frames -> -inf dB -> matplotlib's
    masked-invalid transparent-bad-color path; parity must hold there too."""
    import warnings

    rng = np.random.default_rng(3)
    w = make_wave(4000, 9)
    for _ in range(4):
        m = 600
        s = int(rng.integers(0, 4000 - m))
        w[s : s + m] = 0.0
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        golden = golden_render(w).astype(int)
    mine = wav_to_spectrogram_batch(w[None, :])[0].astype(int)
    diff = np.abs(golden - mine)
    assert diff.max() <= 4
    assert (diff > 1).mean() < 0.05  # alpha-blend edges of masked bands


def test_batched_render_consistent():
    waves = np.stack([make_wave(4000, s) for s in range(4)])
    batch = wav_to_spectrogram_batch(waves)
    assert batch.shape == (4, 112, 112) and batch.dtype == np.uint8
    single = wav_to_spectrogram_batch(waves[1:2])[0]
    np.testing.assert_array_equal(batch[1], single)


def test_batched_render_pallas_flag_matches_xla(monkeypatch):
    """AVMNIST_PALLAS_SPECGRAM=1 routes the PSD stage through the pallas kernel
    (interpret mode on CPU) and must render the same uint8 images +/-1."""
    from avmnist_tpu.dsp import spectrogram as sg

    waves = np.stack([make_wave(4000, s) for s in range(3)])
    base = wav_to_spectrogram_batch(waves)
    monkeypatch.setenv("AVMNIST_PALLAS_SPECGRAM", "1")
    sg._batch_render.clear_cache()  # flag is read at trace time
    flagged = wav_to_spectrogram_batch(waves)
    monkeypatch.delenv("AVMNIST_PALLAS_SPECGRAM")
    sg._batch_render.clear_cache()
    diff = np.abs(base.astype(int) - flagged.astype(int))
    assert diff.max() <= 1
