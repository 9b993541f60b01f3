import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avmnist_tpu.data import Batches
from avmnist_tpu.objectives.autoencoder import AutoencoderConfig, make_autoencoder_objective
from avmnist_tpu.objectives.dino import (
    DinoConfig,
    dino_loss_fn,
    infonce_loss_fn,
    make_dino_objective,
)
from avmnist_tpu.objectives.simclr import SimCLRConfig, make_simclr_objective, nt_xent_loss
from avmnist_tpu.objectives.infonce import InfoNCEConfig, make_infonce_objective
from avmnist_tpu.train.loops import fit


def _np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_nt_xent_matches_manual():
    rng = np.random.default_rng(0)
    z1 = rng.normal(size=(3, 8)).astype(np.float32)
    z2 = rng.normal(size=(3, 8)).astype(np.float32)
    loss = float(nt_xent_loss(jnp.asarray(z1), jnp.asarray(z2), 0.07))
    reps = np.concatenate([z1, z2])
    reps = reps / np.linalg.norm(reps, axis=1, keepdims=True)
    sim = reps @ reps.T / 0.07
    np.fill_diagonal(sim, -np.inf)
    labels = np.array([3, 4, 5, 0, 1, 2])
    logp = np.log(_np_softmax(sim, axis=1) + 1e-30)
    manual = -np.mean(logp[np.arange(6), labels])
    assert abs(loss - manual) < 1e-4


def test_infonce_matches_manual():
    rng = np.random.default_rng(1)
    zi = rng.normal(size=(4, 8)).astype(np.float32)
    za = rng.normal(size=(4, 8)).astype(np.float32)
    loss = float(infonce_loss_fn(jnp.asarray(zi), jnp.asarray(za), 0.07))
    i = zi / np.linalg.norm(zi, axis=1, keepdims=True)
    a = za / np.linalg.norm(za, axis=1, keepdims=True)
    sim = i @ a.T / 0.07
    ce = lambda s: -np.mean(np.log(_np_softmax(s, 1) + 1e-30)[np.arange(4), np.arange(4)])
    manual = 0.5 * (ce(sim) + ce(sim.T))
    assert abs(loss - manual) < 1e-4


def test_dino_loss_matches_manual():
    rng = np.random.default_rng(2)
    s = rng.normal(size=(6, 4, 16)).astype(np.float32)  # Ns=6 views, B=4, P=16
    t = rng.normal(size=(2, 4, 16)).astype(np.float32)
    loss, _ = dino_loss_fn(jnp.asarray(s), jnp.asarray(t), 0.1, 0.04)
    sn = s / np.linalg.norm(s, axis=-1, keepdims=True)
    tn = t / np.linalg.norm(t, axis=-1, keepdims=True)
    tp = _np_softmax(tn / 0.04)
    sp = np.log(_np_softmax(sn / 0.1) + 1e-30)
    total = 0.0
    for si in range(6):
        for ti in range(2):
            total += -(tp[ti] * sp[si]).sum(-1).mean()
    manual = total / 12
    assert abs(float(loss) - manual) < 1e-3


def _run_steps(obj, train, n_steps=4, batch_size=16, mesh=None):
    state = obj.init_fn(jax.random.key(0))
    epoch = Batches(train, batch_size=batch_size, shuffle=True, seed=0)
    it = iter(epoch)
    rng = jax.random.key(1)
    losses = []
    for i in range(n_steps):
        rng, k = jax.random.split(rng)
        try:
            batch = next(it)
        except StopIteration:
            it = iter(epoch)
            batch = next(it)
        state, metrics = obj.step_fn(state, batch, k)
        losses.append(float(metrics["train_loss"]))
    return state, losses


@pytest.mark.slow
def test_simclr_objectives_step(synthetic_arrays):
    train, _ = synthetic_arrays
    for cfg in (SimCLRConfig(audio_only=True, output_dim=32, projection_dim=16),
                SimCLRConfig(audio_only=False, output_dim=32, projection_dim=16)):
        obj = make_simclr_objective(cfg)
        state, losses = _run_steps(obj, train)
        assert all(np.isfinite(losses))
        feats = obj.feature_fn(state, train.gather(np.arange(8)))
        assert feats.shape == (8, 32)


@pytest.mark.slow
def test_infonce_objective_steps_and_learns(synthetic_arrays):
    train, _ = synthetic_arrays
    obj = make_infonce_objective(InfoNCEConfig(output_dim=32, projection_dim=16,
                                               learning_rate=1e-3))
    state, losses = _run_steps(obj, train, n_steps=10, batch_size=32)
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])  # loss trends down
    f = obj.meta["feature_fns"]["image"](state, train.gather(np.arange(4)))
    assert f.shape == (4, 32)


@pytest.mark.slow
def test_autoencoder_objectives(synthetic_arrays):
    train, _ = synthetic_arrays
    for variant in ("plain", "masked"):
        obj = make_autoencoder_objective(
            AutoencoderConfig(variant=variant, output_dim=32, learning_rate=1e-3))
        state, losses = _run_steps(obj, train, n_steps=8, batch_size=32)
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        feats = obj.feature_fn(state, train.gather(np.arange(4)))
        assert feats.shape == (4, 32)


@pytest.mark.parametrize("model_name,mode", [
    ("multi_central", "default"),
    ("multi_simple", "infonce"),
    ("multi_simple", "mse"),
    ("multi_simple", "semi_supervised"),
    ("image_simple", "default"),
    ("spectrogram_simple", "default"),
])
@pytest.mark.slow
def test_dino_objective_steps(synthetic_arrays, model_name, mode):
    train, _ = synthetic_arrays
    cfg = DinoConfig(model_name=model_name, mode=mode, projection_dim=16,
                     output_dim=32, encoder_output_dim=32, n_global_views=2,
                     n_local_views=2, cosine_loss_alpha=0.3)
    obj = make_dino_objective(cfg)
    state, losses = _run_steps(obj, train, n_steps=3, batch_size=8)
    assert all(np.isfinite(losses))
    feats = obj.feature_fn(state, train.gather(np.arange(4)))
    assert feats.shape == (4, 32)


@pytest.mark.slow
def test_dino_ema_and_center_semantics(synthetic_arrays):
    train, _ = synthetic_arrays
    cfg = DinoConfig(model_name="multi_central", projection_dim=8, output_dim=16,
                     encoder_output_dim=16, n_global_views=2, n_local_views=2,
                     momentum=0.9, center_momentum=0.5)
    obj = make_dino_objective(cfg)
    state0 = obj.init_fn(jax.random.key(0))
    # teacher starts as exact student copy
    s_enc = jax.tree.leaves(state0.params["encoder"])
    t_enc = jax.tree.leaves(state0.teacher_params["encoder"])
    for a, b in zip(s_enc, t_enc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(state0.center).max()) == 0.0

    batch = next(iter(Batches(train, batch_size=8, shuffle=False)))
    state1, _ = obj.step_fn(state0, batch, jax.random.key(1))
    # EMA from PRE-update student: teacher1 == m*teacher0 + (1-m)*student0 == student0
    t1 = jax.tree.leaves(state1.teacher_params["encoder"])
    for a, b in zip(s_enc, t1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # student moved, center updated
    s1 = jax.tree.leaves(state1.params["encoder"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(s_enc, s1))
    assert float(jnp.abs(state1.center).max()) > 0.0


@pytest.mark.slow
def test_contrastive_negatives_are_global_on_mesh(synthetic_arrays, mesh8):
    """The InfoNCE similarity matrix must span the GLOBAL batch when the batch is
    sharded over the data axis (all-gathered negatives over ICI): the sharded loss
    must equal the single-device loss on the same batch."""
    from avmnist_tpu.parallel import replicate_state, shard_batch

    train, _ = synthetic_arrays
    obj = make_infonce_objective(InfoNCEConfig(output_dim=16, projection_dim=8,
                                               compute_dtype=jnp.float32))
    state = obj.init_fn(jax.random.key(0))
    batch = next(iter(Batches(train, batch_size=32, shuffle=False)))
    _, m_local = obj.step_fn(state, batch, jax.random.key(1))
    state_r = replicate_state(state, mesh8)
    _, m_mesh = obj.step_fn(state_r, shard_batch(batch, mesh8), jax.random.key(1))
    np.testing.assert_allclose(float(m_local["train_loss"]),
                               float(m_mesh["train_loss"]), rtol=1e-4)
    # sanity: a quarter-batch loss differs (fewer negatives -> lower CE)
    small = {k: (v[:8] if np.ndim(v) > 0 else v) for k, v in batch.items()}
    _, m_small = obj.step_fn(state, small, jax.random.key(1))
    assert abs(float(m_small["train_loss"]) - float(m_local["train_loss"])) > 1e-3


@pytest.mark.slow
def test_dino_per_view_bn(synthetic_arrays):
    """per_view_bn=True computes BN stats per view (reference-exact); the step must
    run and produce a different (finite) loss than the folded default."""
    train, _ = synthetic_arrays
    base = dict(model_name="multi_central", projection_dim=8, output_dim=16,
                encoder_output_dim=16, n_global_views=2, n_local_views=2)
    batch = next(iter(Batches(train, batch_size=8, shuffle=False)))
    losses = {}
    for pvb in (False, True):
        obj = make_dino_objective(DinoConfig(per_view_bn=pvb, **base))
        state = obj.init_fn(jax.random.key(0))
        _, metrics = obj.step_fn(state, batch, jax.random.key(1))
        losses[pvb] = float(metrics["train_loss"])
    assert all(np.isfinite(v) for v in losses.values())
    assert losses[False] != losses[True]  # different BN statistics


def test_dino_remat_student_equivalent(synthetic_arrays):
    """remat_student=True (jax.checkpoint on the student forward) must match
    the non-remat step up to float reassociation — the checkpoint barrier
    shifts XLA fusion boundaries, so BN-mean reduction order differs at the
    ~5e-5 rel level in f32; anything beyond rtol 1e-3 means remat changed
    semantics, not just scheduling."""
    import jax.numpy as jnp

    train, _ = synthetic_arrays
    base = dict(model_name="multi_central", projection_dim=8, output_dim=16,
                encoder_output_dim=16, n_global_views=2, n_local_views=2,
                compute_dtype=jnp.float32)
    batch = next(iter(Batches(train, batch_size=8, shuffle=False)))
    got = {}
    for remat in (False, True):
        obj = make_dino_objective(DinoConfig(remat_student=remat, **base))
        state = obj.init_fn(jax.random.key(0))
        state, m1 = obj.step_fn(state, batch, jax.random.key(1))
        _, m2 = obj.step_fn(state, batch, jax.random.key(1))
        got[remat] = (float(m1["train_loss"]), float(m1["grad_norm"]),
                      float(m2["train_loss"]))
    np.testing.assert_allclose(got[False], got[True], rtol=1e-3)


def test_simclr_and_autoencoder_remat_equivalent(synthetic_arrays):
    """Same float-reassociation-only contract for the SimCLR and autoencoder
    remat flags."""
    import jax.numpy as jnp

    from avmnist_tpu.objectives.autoencoder import (AutoencoderConfig,
                                                    make_autoencoder_objective)
    from avmnist_tpu.objectives.simclr import SimCLRConfig, make_simclr_objective

    train, _ = synthetic_arrays
    batch = next(iter(Batches(train, batch_size=8, shuffle=False)))
    for build in (
            lambda r: make_simclr_objective(SimCLRConfig(
                output_dim=16, projection_dim=8, audio_only=True, remat=r,
                compute_dtype=jnp.float32)),
            lambda r: make_autoencoder_objective(AutoencoderConfig(
                variant="masked", output_dim=16, remat=r,
                compute_dtype=jnp.float32))):
        got = {}
        for remat in (False, True):
            obj = build(remat)
            state = obj.init_fn(jax.random.key(0))
            state, m1 = obj.step_fn(state, batch, jax.random.key(1))
            _, m2 = obj.step_fn(state, batch, jax.random.key(1))
            got[remat] = (float(m1["train_loss"]), float(m2["train_loss"]))
        np.testing.assert_allclose(got[False], got[True], rtol=1e-3)


@pytest.mark.slow
def test_multimodal_simclr_on_mesh(synthetic_arrays, mesh8):
    """The 4-branch multimodal SimCLR step (lax.switch over whole fwd+bwd+Adam
    branches) over the data mesh: sharded NT-Xent loss == single-device loss on
    the same batch/rng (global negatives all-gathered over ICI). This is the
    mesh coverage the driver dryrun delegates here (__graft_entry__._dryrun_impl
    runs the single-branch audio_only variant to fit the driver's clock).

    identity_augment: under a mesh the augment bank runs in shard_map with
    per-DEVICE RNG streams (docs/DEVIATIONS.md), so exact meshed-vs-single
    equality holds only for the augment-free config; the full-augment meshed
    step is separately checked to run partitioned and finite
    (tests/test_parallel_scaling.py pins its collective structure)."""
    from avmnist_tpu.objectives.simclr import SimCLRConfig, make_simclr_objective
    from avmnist_tpu.parallel import replicate_state, shard_batch

    train, _ = synthetic_arrays
    cfg = SimCLRConfig(output_dim=16, projection_dim=8,
                       compute_dtype=jnp.float32, identity_augment=True)
    # ADVICE r4: the meshed objective must be built WITH mesh=mesh8 — that is
    # the production configuration (run_ssl.py passes mesh), and it traces the
    # shard_map/anchor path that keeps the lowering partitioned.
    obj = make_simclr_objective(cfg)              # single-device reference
    obj_mesh = make_simclr_objective(cfg, mesh=mesh8)
    state = obj.init_fn(jax.random.key(0))
    batch = next(iter(Batches(train, batch_size=16, shuffle=False)))
    _, m_local = obj.step_fn(state, batch, jax.random.key(1))
    _, m_mesh = obj_mesh.step_fn(replicate_state(state, mesh8),
                                 shard_batch(batch, mesh8), jax.random.key(1))
    np.testing.assert_allclose(float(m_local["train_loss"]),
                               float(m_mesh["train_loss"]), rtol=1e-4)
    assert float(m_local["mode"]) == float(m_mesh["mode"])


@pytest.mark.slow
def test_dino_on_mesh(synthetic_arrays, mesh8):
    from avmnist_tpu.parallel import shard_batch, replicate_state

    train, _ = synthetic_arrays
    cfg = DinoConfig(model_name="multi_central", projection_dim=8, output_dim=16,
                     encoder_output_dim=16, n_global_views=2, n_local_views=2)
    obj = make_dino_objective(cfg)
    state = replicate_state(obj.init_fn(jax.random.key(0)), mesh8)
    batch = shard_batch(next(iter(Batches(train, batch_size=16, shuffle=False))), mesh8)
    state, metrics = obj.step_fn(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["train_loss"]))
    assert len(batch["image"].sharding.device_set) == 8


@pytest.mark.slow
def test_probe_bn_train_mode(synthetic_arrays):
    """Reference-exact probe-BN semantics (VERDICT.md Missing #6): train-mode
    feature extraction uses batch stats + dropout and UPDATES a probe-local copy
    of the running stats; eval extraction with the updated stats differs from the
    SSL-state stats; the full train-mode probe pipeline yields finite accuracy."""
    from avmnist_tpu.train.experiment import (_probe_features,
                                              _probe_features_bn_train)
    from avmnist_tpu.eval.probes import train_linear_probe

    train, test = synthetic_arrays
    cfg = DinoConfig(model_name="multi_central", projection_dim=8, output_dim=16,
                     encoder_output_dim=16, n_global_views=1, n_local_views=1,
                     dropout=0.3)
    obj = make_dino_objective(cfg)
    state = obj.init_fn(jax.random.key(0))

    batch = train.gather(np.arange(16))
    stats0 = obj.meta["initial_probe_stats"](state)
    f1, stats1 = obj.meta["feature_fn_train"](state, batch, jax.random.key(1), stats0)
    assert f1.shape == (16, 16)
    # running stats must have moved (BN momentum update from batch stats)
    moved = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(stats0), jax.tree.leaves(stats1))]
    assert any(moved)
    # dropout active in train mode: different rng -> different features
    f2, _ = obj.meta["feature_fn_train"](state, batch, jax.random.key(2), stats0)
    assert not np.allclose(np.asarray(f1), np.asarray(f2))
    # eval-mode with updated stats differs from eval-mode with SSL stats
    e_new = obj.meta["feature_fn_stats"](state, batch, stats1)
    e_old = obj.feature_fn(state, batch)
    assert not np.allclose(np.asarray(e_new), np.asarray(e_old))

    (tf, tl), [(vf, vl)] = _probe_features_bn_train(obj, state, train, [test],
                                                    batch_size=32, seed=0)
    assert len(tf) == len(train.labels) and len(vf) == len(test.labels)
    out = train_linear_probe(tf, tl, vf, vl, epochs=1)
    assert np.isfinite(out["accuracy"])


def test_torch_adam_branch_semantics(monkeypatch, synthetic_arrays):
    """AVMNIST_TORCH_ADAM_BRANCHES=1 freezes params+moments of the encoders a
    SimCLR mode does not touch (torch grad=None semantics, DEVIATIONS.md)."""
    train, _ = synthetic_arrays
    from avmnist_tpu.objectives.simclr import SimCLRConfig, make_simclr_objective

    monkeypatch.setenv("AVMNIST_TORCH_ADAM_BRANCHES", "1")
    obj = make_simclr_objective(SimCLRConfig(output_dim=16, projection_dim=8))
    monkeypatch.delenv("AVMNIST_TORCH_ADAM_BRANCHES")
    state = obj.init_fn(jax.random.key(0))
    batch = next(iter(Batches(train, batch_size=16, shuffle=False)))
    rng = jax.random.key(2)
    hit = set()
    for _ in range(20):
        prev = jax.tree.map(lambda x: np.asarray(x), state.params)
        state, m = obj.step_fn(state, batch, rng)
        mode = int(m["mode"])

        def same(key):
            return all(np.array_equal(a, np.asarray(b)) for a, b in zip(
                jax.tree.leaves(prev[key]),
                jax.tree.leaves(state.params[key])))

        if mode == 0:  # img-img: audio branch must be bitwise frozen
            assert same("audio_encoder") and same("audio_projection_head")
            assert not same("image_encoder")
            hit.add(0)
        elif mode == 1:  # aud-aud: image branch frozen
            assert same("image_encoder") and same("image_projection_head")
            assert not same("audio_encoder")
            hit.add(1)
        if hit == {0, 1}:
            break
    assert hit == {0, 1}, f"modes seen: {hit}"


def test_cosine_epoch_schedule_warmup():
    """warmup_epochs=0 is reference-exact CosineAnnealingLR(T_max=E) stepped per
    epoch; warmup_epochs>0 prepends a linear per-step ramp that meets the cosine
    at the warmup boundary (opt-in deviation, docs/DEVIATIONS.md)."""
    import numpy as np

    from avmnist_tpu.train.optim import cosine_epoch_schedule

    lr, E, spe = 1e-3, 10, 4
    base = cosine_epoch_schedule(lr, E, spe)
    # epoch-quantized cosine, exact at epoch boundaries
    assert np.isclose(float(base(0)), lr)
    assert np.isclose(float(base(5 * spe)), lr * 0.5 * (1 + np.cos(np.pi * 0.5)))
    assert float(base(E * spe)) < 1e-9

    warm = cosine_epoch_schedule(lr, E, spe, warmup_epochs=2)
    ws = 2 * spe
    # linear ramp 0 -> lr over the warmup steps
    assert np.isclose(float(warm(0)), lr / ws)
    assert np.isclose(float(warm(ws - 1)), lr)
    # after warmup: identical to the reference-exact schedule
    for s in (ws, ws + 3, E * spe):
        assert np.isclose(float(warm(s)), float(base(s)))
