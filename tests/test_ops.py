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


# ---------------------------------------------------------------------------
# Fused BN+ReLU+MaxPool2 (ops/pallas_fused.py), interpret mode on CPU.
# ---------------------------------------------------------------------------
import pytest

from avmnist_tpu.ops import pallas_fused


@pytest.fixture()
def fused_interpret(monkeypatch):
    monkeypatch.setattr(pallas_fused, "_INTERPRET", True)
    monkeypatch.setenv("AVMNIST_PALLAS_FUSED", "1")


def _fused_case(y, gamma, beta, cot):
    """Returns ((out, mean, var), (dy, dgamma, dbeta)) for pallas and reference."""

    def run(fn):
        def scalar(y_, g_, b_):
            out, _, _ = fn(y_, g_, b_)
            return (out.astype(jnp.float32) * cot).sum()

        outs = fn(y, gamma, beta)
        grads = jax.grad(scalar, argnums=(0, 1, 2))(y, gamma, beta)
        return outs, grads

    return run(pallas_fused.bn_relu_pool), run(pallas_fused.bn_relu_pool_reference)


def test_bn_relu_pool_matches_xla_reference(fused_interpret):
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.normal(size=(4, 8, 8, 5)).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.3 * rng.normal(size=(5,)).astype(np.float32))
    beta = jnp.asarray(0.2 * rng.normal(size=(5,)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(4, 4, 4, 5)).astype(np.float32))
    (got, ref) = _fused_case(y, gamma, beta, cot)
    for g, r, name in zip(got[0], ref[0], ("out", "mean", "var")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-5,
                                   atol=1e-5, err_msg=name)
    for g, r, name in zip(got[1], ref[1], ("dy", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4,
                                   atol=1e-4, err_msg=name)


def test_bn_relu_pool_tie_breaking_first_max(fused_interpret):
    # Small-integer-valued inputs create exact duplicates in almost every pool
    # window: the gradient must go to the FIRST max in row-major window order
    # (XLA select_and_scatter semantics). This exercises all six earlier-candidate
    # orderings, including (1,0) <- (0,1), which a naive neighbor-mask set misses.
    rng = np.random.default_rng(3)
    # gamma=1, beta chosen so normalized values stay positive (relu inert): ties in
    # y are then exactly ties in z, and the oracle comparison is pure pool routing.
    y = jnp.asarray(rng.integers(0, 3, size=(3, 8, 8, 4)).astype(np.float32))
    gamma = jnp.ones((4,), jnp.float32)
    beta = jnp.full((4,), 5.0, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(3, 4, 4, 4)).astype(np.float32))
    (got, ref) = _fused_case(y, gamma, beta, cot)
    for g, r, name in zip(got[1], ref[1], ("dy", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4,
                                   atol=1e-4, err_msg=name)


def test_bn_relu_pool_bf16(fused_interpret):
    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.normal(size=(2, 8, 8, 4))).astype(jnp.bfloat16)
    gamma = jnp.ones((4,), jnp.bfloat16)
    beta = jnp.zeros((4,), jnp.bfloat16)
    out, mean, var = pallas_fused.bn_relu_pool(y, gamma, beta)
    rout, rmean, rvar = pallas_fused.bn_relu_pool_reference(y, gamma, beta)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(rout, np.float32), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(rmean), rtol=1e-2,
                               atol=1e-2)


def test_conv_bn_relu_fused_path_checkpoint_compatible(fused_interpret):
    """Fused and unfused ConvBNRelu: same param tree, same forward, same grads."""
    from avmnist_tpu.models.layers import ConvBNRelu

    block = ConvBNRelu(features=8)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(4, 8, 8, 1)),
                    jnp.float32)
    variables = block.init(jax.random.key(0), x, train=False)

    def fwd(params, stats, use_fused):
        import os
        os.environ["AVMNIST_PALLAS_FUSED"] = "1" if use_fused else "0"
        out, upd = block.apply({"params": params, "batch_stats": stats}, x,
                               train=True, mutable=["batch_stats"])
        return out, upd["batch_stats"]

    out_f, stats_f = fwd(variables["params"], variables["batch_stats"], True)
    out_u, stats_u = fwd(variables["params"], variables["batch_stats"], False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u), rtol=1e-5,
                               atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5), stats_f, stats_u)

    def loss(params, use_fused):
        return fwd(params, variables["batch_stats"], use_fused)[0].sum()

    g_f = jax.grad(loss)(variables["params"], True)
    g_u = jax.grad(loss)(variables["params"], False)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4), g_f, g_u)


def test_bn_relu_pool_wide_channels(fused_interpret):
    """C >= 128: the w-chunk IS a full lane group; rolls shift whole vregs."""
    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.normal(size=(2, 4, 4, 128)).astype(np.float32))
    gamma = jnp.asarray(1 + 0.1 * rng.normal(size=(128,)).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.normal(size=(128,)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(2, 2, 2, 128)).astype(np.float32))

    def s(fn):
        def loss(y_, g_, b_):
            out, _, _ = fn(y_, g_, b_)
            return (out * cot).sum()
        v, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(y, gamma, beta)
        return v, grads

    vp, gp = s(pallas_fused.bn_relu_pool)
    vr, gr = s(pallas_fused.bn_relu_pool_reference)
    np.testing.assert_allclose(float(vp), float(vr), rtol=1e-5)
    for a, b, nm in zip(gp, gr, ("dy", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4, err_msg=nm)


def test_nt_xent_pallas_loss_and_grads_match_xla(monkeypatch):
    """The flag-routed pallas NT-Xent path (custom_vjp: pallas fwd in interpret
    mode + analytic XLA bwd) matches the plain XLA loss to float tolerance."""
    from avmnist_tpu.objectives.simclr import nt_xent_loss

    rng = np.random.default_rng(3)
    z1 = jnp.asarray(rng.normal(size=(16, 24)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(16, 24)).astype(np.float32))

    def run():
        return jax.value_and_grad(lambda a, b: nt_xent_loss(a, b, 0.07),
                                  argnums=(0, 1))(z1, z2)

    monkeypatch.setenv("AVMNIST_PALLAS_NTXENT", "0")
    l0, g0 = run()
    monkeypatch.setenv("AVMNIST_PALLAS_NTXENT", "1")
    l1, g1 = run()
    monkeypatch.delenv("AVMNIST_PALLAS_NTXENT")
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_pallas_ntxent_untileable_n_falls_back_to_xla():
    """When n>256 has no x8 row tile divisor (e.g. 2B=998), the pallas entry must
    return the XLA chain result instead of emitting one full-size VMEM block
    (ADVICE r2). Small n (<=256) keeps the single-block kernel: _row_tile(30)=30."""
    from avmnist_tpu.ops.pallas_ntxent import _row_tile

    assert _row_tile(30) == 30
    assert _row_tile(998) is None
    rng = np.random.default_rng(2)
    reps = rng.normal(size=(998, 16)).astype(np.float32)
    got = np.asarray(nt_xent_logits_pallas(jnp.asarray(reps), 0.07, interpret=True))
    z = reps / np.linalg.norm(reps, axis=1, keepdims=True)
    want = z @ z.T / 0.07
    np.fill_diagonal(want, -np.inf)
    mask = ~np.eye(998, dtype=bool)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-4, atol=1e-4)
    assert np.all(np.isneginf(np.diag(got)))
