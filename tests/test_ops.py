"""Pallas kernels vs their XLA references (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from avmnist_tpu.dsp.spectrogram import psd_specgram
from avmnist_tpu.ops import nt_xent_logits_pallas, psd_specgram_pallas


def test_pallas_specgram_matches_fft_path():
    rng = np.random.default_rng(0)
    waves = rng.normal(size=(3, 2048)).astype(np.float32)
    got = np.asarray(psd_specgram_pallas(jnp.asarray(waves), 8000.0, interpret=True))
    want = np.stack([np.asarray(psd_specgram(jnp.asarray(w), 8000.0)) for w in waves])
    assert got.shape == want.shape  # (3, 129, 15)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-10)


def test_pallas_ntxent_matches_jnp():
    rng = np.random.default_rng(1)
    reps = rng.normal(size=(16, 32)).astype(np.float32)
    got = np.asarray(nt_xent_logits_pallas(jnp.asarray(reps), 0.07, interpret=True))
    z = reps / np.linalg.norm(reps, axis=1, keepdims=True)
    want = z @ z.T / 0.07
    np.fill_diagonal(want, -np.inf)
    mask = ~np.eye(16, dtype=bool)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-4, atol=1e-5)
    assert np.all(np.isneginf(np.diag(got)))
