import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avmnist_tpu.models import MODEL_MAP, UNIMODAL_MODEL_MAP, build_encoder

B = 2
IMG = jnp.zeros((B, 28, 28, 1), jnp.float32)
AUD = jnp.zeros((B, 112, 112, 1), jnp.float32)


def init_and_apply(model, *args, method=None):
    rng = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rng, *args, train=False)
    out, updates = model.apply(
        variables, *args, train=True,
        rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"], method=method,
    )
    return out, variables


@pytest.mark.parametrize("name", [
    pytest.param(n, marks=pytest.mark.slow) if n in ("multi_mobile_vit", "multi_resnet")
    else n for n in sorted(MODEL_MAP)])
def test_multimodal_encoder_shapes(name):
    img = jnp.asarray(np.random.default_rng(0).normal(size=IMG.shape), jnp.float32)
    aud = jnp.asarray(np.random.default_rng(1).normal(size=AUD.shape), jnp.float32)
    model = build_encoder(name, output_dim=64, encoder_output_dim=96)
    out, variables = init_and_apply(model, img, aud)
    assert out.shape == (B, 64)
    assert jnp.all(jnp.isfinite(out))
    # per-modality taps used by the DINO hybrids
    f_i = model.apply(variables, img, train=False, method="encode_image") if name in MODEL_MAP else None
    if f_i is not None:
        assert f_i.shape == (B, 96)
        f_a = model.apply(variables, aud, train=False, method="encode_audio")
        assert f_a.shape == (B, 96)


@pytest.mark.parametrize("name", sorted(UNIMODAL_MODEL_MAP))
def test_unimodal_encoder_shapes(name):
    img = jnp.asarray(np.random.default_rng(0).normal(size=IMG.shape), jnp.float32)
    aud = jnp.asarray(np.random.default_rng(1).normal(size=AUD.shape), jnp.float32)
    model = build_encoder(name, output_dim=32)
    assert model.modality in ("image", "audio")
    out, _ = init_and_apply(model, img, aud)
    assert out.shape == (B, 32)
    assert jnp.all(jnp.isfinite(out))


def test_gates_init():
    model = build_encoder("multi_simple_gated", output_dim=16, encoder_output_dim=32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, IMG, AUD, train=False
    )
    assert float(variables["params"]["gate_image"]) == 0.5
    assert float(variables["params"]["gate_audio"]) == 0.5


def test_centralnet_shapes():
    from avmnist_tpu.models.centralnet import CentralNet

    model = CentralNet(channels=16)
    out, _ = init_and_apply(model, AUD, IMG)
    audio_out, image_out, fusion_out = out
    assert audio_out.shape == image_out.shape == fusion_out.shape == (B, 10)


def test_centralnet_fuse_width_matching():
    from avmnist_tpu.models.centralnet import _fuse
    import jax.numpy as jnp

    f1 = jnp.ones((2, 8))
    f2 = jnp.ones((2, 4))
    a1 = jnp.full((1,), 2.0)
    a2 = jnp.full((1,), 3.0)
    w = _fuse(f1, f2, a1, a2, "wsum")
    assert w.shape == (2, 8)
    np.testing.assert_allclose(w[:, :4], 2.0 + 3.0)
    np.testing.assert_allclose(w[:, 4:], 2.0)
    # equal widths: reference quirk applies a1 to both
    q = _fuse(f1, f1, a1, a2, "wsum")
    np.testing.assert_allclose(q, 4.0)
    c = _fuse(f1, f2, a1, a2, "cat")
    assert c.shape == (2, 16)


def test_lenet_feature_dims():
    from avmnist_tpu.models.lenet import CentralUnimodalAudio, CentralUnimodalImage

    out, _ = init_and_apply(CentralUnimodalImage(), IMG)
    assert out.shape == (B, 64 * 5 * 5)
    out, _ = init_and_apply(CentralUnimodalAudio(), AUD)
    assert out.shape == (B, 64 * 7 * 7)
    out, _ = init_and_apply(CentralUnimodalImage(with_head=True), IMG)
    assert out.shape == (B, 10)


def test_autoencoders():
    from avmnist_tpu.models.autoencoder import (
        ConvAutoencoder,
        MaskedConvAutoencoder,
        MobileVitMaskedAutoencoder,
    )

    (recon, latent), _ = init_and_apply(ConvAutoencoder(output_dim=64), AUD)
    assert recon.shape == AUD.shape and latent.shape == (B, 64)
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0
    (recon, latent), _ = init_and_apply(MaskedConvAutoencoder(output_dim=64), AUD)
    assert recon.shape == AUD.shape
    (recon, latent), _ = init_and_apply(MobileVitMaskedAutoencoder(output_dim=64), AUD)
    assert recon.shape == AUD.shape


def test_mini_resnet():
    from avmnist_tpu.models.mini_resnet import MiniResNet

    out, _ = init_and_apply(MiniResNet(), AUD)
    assert out.shape == (B, 512)


def test_projection_head():
    from avmnist_tpu.models.layers import ProjectionHead

    x = jnp.ones((B, 64))
    out, _ = init_and_apply(ProjectionHead(projection_dim=32, dropout_rate=0.3), x)
    assert out.shape == (B, 32)
