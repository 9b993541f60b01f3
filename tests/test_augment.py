import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avmnist_tpu.augment import MultiCropAugment, SimCLRAugment, make_views
from avmnist_tpu.augment import functional as F
from avmnist_tpu.augment.multicrop import apply_chain, chain_from_config, op


def rand_img(h=16, w=16, seed=0):
    return jnp.asarray(np.random.default_rng(seed).uniform(size=(h, w)), jnp.float32)


def test_affine_identity():
    img = rand_img()
    out = F.affine_bilinear(img, F.IDENTITY)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_affine_integer_translation_zero_fill():
    img = rand_img()
    # inverse map: in_x = out_x + 3  -> shifts content left by 3, zero fill on right
    m = jnp.asarray(F._mat(1.0, 1.0, 3.0, 0.0))
    out = np.asarray(F.affine_bilinear(img, m))
    np.testing.assert_allclose(out[:, :13], np.asarray(img)[:, 3:], atol=1e-6)
    np.testing.assert_allclose(out[:, 13:], 0.0, atol=1e-6)


def test_separable_matches_gather():
    """The MXU (matmul) resample path must agree with the gather path for
    axis-aligned transforms."""
    imgs = jnp.stack([rand_img(20, 24, s) for s in range(3)])
    sx = jnp.array([0.8, 1.3, 1.0])
    tx = jnp.array([1.5, -2.0, 0.3])
    sy = jnp.array([1.1, 0.7, 1.0])
    ty = jnp.array([-0.5, 2.2, 0.0])
    mats = jax.vmap(F._mat)(sx, sy, tx, ty)
    a = F.separable_resample(imgs, sx, tx, sy, ty)
    b = F.batched_affine_gather(imgs, mats)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_time_warp_is_linear_interp():
    img = rand_img()
    m = jnp.asarray(F._mat(2.0, 1.0, 0.0, 0.0))  # rate 2: out col t samples in col 2t
    out = np.asarray(F.affine_bilinear(img, m))
    ref = np.asarray(img)[:, ::2]
    np.testing.assert_allclose(out[:, :8], ref, atol=1e-5)
    np.testing.assert_allclose(out[:, 9:], 0.0, atol=1e-6)  # past stretched end


def test_axis_mask_zeroes_band():
    imgs = jnp.ones((3, 112, 112))
    out = np.asarray(F.axis_mask(imgs, jax.random.key(0), 25.0, 1))
    for b in range(3):
        rows = out[b].mean(axis=1)
        assert np.all((rows == 0) | (rows == 1))
        assert 0 <= int((rows == 0).sum()) <= 25
    # per-sample independent bands
    assert not np.array_equal(out[0], out[1])
    out_t = np.asarray(F.axis_mask(imgs, jax.random.key(1), 25.0, 2))
    cols = out_t[0].mean(axis=0)
    assert np.all((cols == 0) | (cols == 1))


def test_grouped_masking_exact_count():
    imgs = jnp.ones((2, 112, 112))
    out = np.asarray(F.grouped_masking(imgs, jax.random.key(0), mask_ratio=0.6))
    for b in range(2):
        groups = out[b].reshape(28, 4, 28, 4).mean(axis=(1, 3))
        assert int((groups == 0).sum()) == int(0.6 * 28 * 28)
    assert not np.array_equal(out[0], out[1])


def test_grouped_mask_batch():
    keep = np.asarray(F.grouped_mask_batch(jax.random.key(0), (4, 112, 112), 0.75))
    assert keep.shape == (4, 112, 112)
    per = keep.reshape(4, 28, 4, 28, 4).mean(axis=(2, 4))
    for b in range(4):
        assert int((per[b] == 0).sum()) == int(0.75 * 784)
    assert not np.array_equal(keep[0], keep[1])


def test_random_erasing_applies_box():
    imgs = jnp.ones((2, 28, 28))
    out = np.asarray(F.random_erasing(imgs, jax.random.key(0), p=1.0,
                                      scale=(0.1, 0.1), ratio=(1.0, 1.0)))
    assert (out == 0).sum() > 0
    out0 = np.asarray(F.random_erasing(imgs, jax.random.key(0), p=0.0, scale=(0.1, 0.1)))
    assert (out0 == 1).all()


def test_gaussian_blur_preserves_mean():
    imgs = jnp.stack([rand_img(28, 28, s) for s in range(2)])
    out = F.gaussian_blur3(imgs, jax.random.key(0))
    assert abs(float(out.mean()) - float(imgs.mean())) < 0.01


def test_elastic_transform_mild():
    imgs = jnp.stack([rand_img(28, 28, s) for s in range(2)])
    out = F.elastic_transform(imgs, jax.random.key(0), alpha=20.0, sigma=3.0)
    assert out.shape == imgs.shape
    assert float(jnp.abs(out - imgs).mean()) < 0.2


def test_make_views_shapes_and_determinism():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(4, 28, 28)), jnp.float32)
    audios = jnp.asarray(rng.uniform(size=(4, 112, 112)), jnp.float32)
    fn = jax.jit(lambda i, a, k: make_views(i, a, k, 2, 4))
    gi, ga, li, la = fn(images, audios, jax.random.key(7))
    assert gi.shape == (4, 2, 28, 28, 1)
    assert ga.shape == (4, 2, 112, 112, 1)
    assert li.shape == (4, 4, 28, 28, 1)
    assert la.shape == (4, 4, 112, 112, 1)
    gi2, *_ = fn(images, audios, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(gi2))
    gi3, *_ = fn(images, audios, jax.random.key(8))
    assert not np.array_equal(np.asarray(gi), np.asarray(gi3))
    # views differ from each other
    assert not np.array_equal(np.asarray(gi[:, 0]), np.asarray(gi[:, 1]))


def test_chain_from_config_reference_format():
    best = {
        "global_views": {
            "frequency_mask": {"freq_mask_param": 5, "p": 0.4},
            "time_warp": {"min_factor": 0.9, "max_factor": 1.1, "p": 0.37},
            "random_resized_crop": {"size": [112, 112], "scale": [0.7, 1.0], "p": 0.9},
        },
        "local_views": {
            "grouped_masking": {"mask_ratio": 0.648, "p": 0.97},
            "gaussian_noise": {"p": 0.84, "std": 0.18},
        },
    }
    aug = MultiCropAugment.from_config(2, 4, {"augmentations": best})
    assert len(aug.audio_global) == 3
    assert aug.audio_global[0].kind == "frequency_mask"
    assert aug.audio_local[1].kind == "gaussian_noise"
    audios = jnp.ones((2, 112, 112))
    images = jnp.ones((2, 28, 28))
    out = aug(images, audios, jax.random.key(0))
    assert out[1].shape == (2, 2, 112, 112, 1)
    assert "MultiCropAugment" in aug.describe()


def test_simclr_augment():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(4, 28, 28)), jnp.float32)
    audios = jnp.asarray(rng.uniform(size=(4, 112, 112)), jnp.float32)
    i1, a1, i2, a2 = jax.jit(lambda i, a, k: SimCLRAugment()(i, a, k))(
        images, audios, jax.random.key(0)
    )
    assert i1.shape == i2.shape == (4, 28, 28, 1)
    assert a1.shape == a2.shape == (4, 112, 112, 1)
    assert not np.array_equal(np.asarray(i1), np.asarray(i2))


def test_geometric_composition_identity():
    # A chain of two identity-parameter geometric ops equals the input.
    img = rand_img(28, 28)
    chain = [op("random_rotation", degrees=0.0), op("random_affine", translate=(0.0, 0.0))]
    out = apply_chain(chain, img, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_audio_chain_uses_matmul_path():
    # Audio default chains contain no rotation -> statically separable.
    from avmnist_tpu.augment.multicrop import AUDIO_GLOBAL, AUDIO_LOCAL, _op_has_rotation

    assert not any(_op_has_rotation(s) for s in AUDIO_GLOBAL)
    assert not any(_op_has_rotation(s) for s in AUDIO_LOCAL)


def test_nearest_warp_ablation_toggle(monkeypatch):
    """AVMNIST_NEAREST_WARP=1 makes every interp row a one-hot at round(coord)
    (torchvision RandomRotation/RandomAffine default NEAREST; DEVIATIONS.md)."""
    coords = jnp.asarray([[0.2, 3.6, 27.4, -1.2, 28.4]])
    monkeypatch.setenv("AVMNIST_NEAREST_WARP", "1")
    m = np.asarray(F._interp_matrix(coords, 28))
    assert set(np.unique(m)) <= {0.0, 1.0}
    np.testing.assert_array_equal(m[0].sum(axis=-1), [1, 1, 1, 0, 0])  # OOB rows zero
    assert m[0, 0, 0] == 1 and m[0, 1, 4] == 1 and m[0, 2, 27] == 1
    monkeypatch.delenv("AVMNIST_NEAREST_WARP")
    m2 = np.asarray(F._interp_matrix(coords, 28))
    assert np.abs(m2[0, 0, 0] - 0.8) < 1e-6  # bilinear hat restored


def test_rrc_retry_ablation_matches_torchvision_sampler(monkeypatch):
    """AVMNIST_RRC_RETRY=1: boxes come from the exact 10-retry torchvision
    sampler — always in-bounds, integer top-left, same support as single-shot."""
    monkeypatch.setenv("AVMNIST_RRC_RETRY", "1")
    n = 512
    mats = F.random_resized_crop_mats(jax.random.key(0), n, (112, 112), (112, 112),
                                      scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3))
    monkeypatch.delenv("AVMNIST_RRC_RETRY")
    mats = np.asarray(mats)
    sx, sy = mats[:, 0, 0], mats[:, 1, 1]
    left = mats[:, 0, 2] - 0.5 * sx + 0.5
    top = mats[:, 1, 2] - 0.5 * sy + 0.5
    w, h = sx * 112, sy * 112
    assert (w >= 1).all() and (w <= 112).all() and (h >= 1).all() and (h <= 112).all()
    assert (left >= 0).all() and (left + w <= 112 + 1e-3).all()
    assert (top >= 0).all() and (top + h <= 112 + 1e-3).all()
    np.testing.assert_allclose(left, np.round(left), atol=1e-4)  # integer positions
    # aspect ratio near the log-uniform range (integer rounding distorts small
    # boxes — torchvision's sampler has the identical property)
    r = w / h
    assert (r >= 0.5).all() and (r <= 2.0).all()
    assert np.median(r) > 0.8 and np.median(r) < 1.25


def test_rrc_exact_sampler_is_default(monkeypatch):
    """Round-3 policy flip: with NO env override the reference-exact 10-retry
    sampler runs (integer top-left corners are its signature — the single-shot
    variant produces continuous positions)."""
    monkeypatch.delenv("AVMNIST_RRC_RETRY", raising=False)
    n = 256
    mats = np.asarray(F.random_resized_crop_mats(
        jax.random.key(3), n, (112, 112), (112, 112),
        scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)))
    sx, sy = mats[:, 0, 0], mats[:, 1, 1]
    left = mats[:, 0, 2] - 0.5 * sx + 0.5
    top = mats[:, 1, 2] - 0.5 * sy + 0.5
    np.testing.assert_allclose(left, np.round(left), atol=1e-4)
    np.testing.assert_allclose(top, np.round(top), atol=1e-4)
