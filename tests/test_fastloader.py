import numpy as np
import pytest

from avmnist_tpu.data import fastloader


def test_build_and_match_numpy():
    lib = fastloader.load_library()
    if lib is None:
        pytest.skip("no C compiler available")
    rng = np.random.default_rng(0)
    idx = rng.permutation(100)[:32].astype(np.int64)

    u8 = rng.integers(0, 256, size=(100, 7, 5)).astype(np.uint8)
    np.testing.assert_array_equal(fastloader.gather_rows(u8, idx, np.uint8), u8[idx])

    f64 = rng.normal(size=(100, 13)).astype(np.float64)
    np.testing.assert_allclose(fastloader.gather_rows(f64, idx, np.float32),
                               f64[idx].astype(np.float32), rtol=1e-6)

    f32 = rng.normal(size=(100, 13)).astype(np.float32)
    np.testing.assert_array_equal(fastloader.gather_rows(f32, idx, np.float32), f32[idx])


def test_fallback_noncontiguous():
    rng = np.random.default_rng(1)
    base = rng.integers(0, 255, size=(50, 8, 8)).astype(np.uint8)
    view = base[:, ::2, :]  # non-contiguous
    idx = np.arange(10, dtype=np.int64)
    np.testing.assert_array_equal(fastloader.gather_rows(view, idx, np.uint8), view[idx])


def test_memmap_gather(tmp_path):
    lib = fastloader.load_library()
    p = str(tmp_path / "x.bin")
    mm = np.memmap(p, mode="w+", dtype=np.uint8, shape=(20, 4, 4))
    mm[:] = np.arange(20 * 16).reshape(20, 4, 4) % 256
    mm.flush()
    ro = np.memmap(p, mode="r", dtype=np.uint8, shape=(20, 4, 4))
    idx = np.array([3, 1, 19], np.int64)
    np.testing.assert_array_equal(fastloader.gather_rows(ro, idx, np.uint8),
                                  np.asarray(ro)[idx])
