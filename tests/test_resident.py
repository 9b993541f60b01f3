"""Device-resident data path == streaming path (data/resident.py, train/loops.py).

The resident pipeline exists purely for performance (the relay's 28 MB/s H2D,
docs/PERF_NOTES.md); these tests pin that it is a pure refactor: identical batch
composition, identical training math, identical eval/probe outputs."""
import jax
import numpy as np
import pytest

from avmnist_tpu.data import Batches
from avmnist_tpu.data.resident import ResidentSplit
from avmnist_tpu.objectives.dino import DinoConfig, make_dino_objective
from avmnist_tpu.objectives.supervised import make_centralnet_objective
from avmnist_tpu.train import experiment as exp
from avmnist_tpu.train.loops import evaluate, evaluate_resident, fit


def _allclose_trees(a, b, rtol=5e-4, atol=5e-5):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def test_train_index_matches_batches(synthetic_arrays):
    train, _ = synthetic_arrays
    res = ResidentSplit(train)
    plan = res.train_index(batch_size=32, seed=7, epoch=0)
    got = [train.gather(row)["label"] for row in plan]
    want = [b["label"] for b in Batches(train, batch_size=32, shuffle=True, seed=7)]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_eval_index_covers_split_with_padding(synthetic_arrays):
    _, test = synthetic_arrays
    res = ResidentSplit(test)
    plan, valid = res.eval_index(batch_size=24)
    assert plan.shape[1] == 24
    flat = plan.reshape(-1)[: res.n]
    np.testing.assert_array_equal(np.sort(flat), np.arange(res.n))
    assert valid[-1] == res.n - (len(plan) - 1) * 24
    # padded tail repeats the final row (Batches pad contract)
    assert (plan.reshape(-1)[res.n:] == res.n - 1).all()


def test_resident_fit_matches_streaming(synthetic_arrays):
    """Same batches, same rng streams, same optimizer math. The two paths are
    different XLA programs (whole-epoch scan vs per-step jit), so bf16 compute
    legitimately rounds differently — assert trajectory-level equivalence plus
    bitwise determinism of the resident path itself."""
    train, _ = synthetic_arrays
    obj = make_centralnet_objective(channels=4, learning_rate=1e-3)
    state_a, hist_a = fit(obj, train, epochs=2, batch_size=32, seed=3)
    state_b, hist_b = fit(obj, ResidentSplit(train), epochs=2, batch_size=32, seed=3)
    num = sum(float(np.linalg.norm(np.asarray(x) - np.asarray(y)) ** 2)
              for x, y in zip(jax.tree.leaves(state_a.params),
                              jax.tree.leaves(state_b.params))) ** 0.5
    den = sum(float(np.linalg.norm(np.asarray(x)) ** 2)
              for x in jax.tree.leaves(state_a.params)) ** 0.5
    assert num / den < 1e-2, f"params diverged: rel norm diff {num / den}"
    assert abs(hist_a[-1]["train_loss"] - hist_b[-1]["train_loss"]) < 5e-3
    assert int(state_a.step) == int(state_b.step)
    # resident path is deterministic: re-run is bitwise identical
    state_c, _ = fit(obj, ResidentSplit(train), epochs=2, batch_size=32, seed=3)
    for x, y in zip(jax.tree.leaves(state_b.params), jax.tree.leaves(state_c.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_evaluate_resident_matches_streaming(synthetic_arrays):
    train, test = synthetic_arrays
    obj = make_centralnet_objective(channels=4, learning_rate=1e-3)
    state, _ = fit(obj, train, epochs=1, batch_size=32, seed=1)
    a = evaluate(obj, state, Batches(test, 24, shuffle=False, drop_remainder=True,
                                     pad_final=True))
    b = evaluate_resident(obj, state, ResidentSplit(test), batch_size=24)
    assert a["accuracy"] == b["accuracy"]
    np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-5)
    np.testing.assert_array_equal(a["preds"], b["preds"])
    np.testing.assert_allclose(a["probs"], b["probs"], rtol=1e-4, atol=1e-6)


def _small_dino():
    return make_dino_objective(DinoConfig(
        model_name="multi_central", projection_dim=8, output_dim=16,
        encoder_output_dim=16, n_global_views=2, n_local_views=2))


def test_probe_features_resident_matches_streaming(synthetic_arrays):
    train, _ = synthetic_arrays
    obj = _small_dino()
    state = obj.init_fn(jax.random.key(0))
    tf_a, tl_a = exp._probe_features(obj, state, train, batch_size=32)
    tf_b, tl_b = exp._probe_features(obj, state, ResidentSplit(train), batch_size=32)
    np.testing.assert_array_equal(tl_a, np.asarray(tl_b))
    np.testing.assert_allclose(tf_a, np.asarray(tf_b), rtol=2e-2, atol=2e-3)


def test_probe_bn_train_resident_matches_streaming(synthetic_arrays):
    train, test = synthetic_arrays
    obj = _small_dino()
    if "feature_fn_train" not in obj.meta:
        pytest.skip("objective has no train-mode probe path")
    state = obj.init_fn(jax.random.key(0))
    (tf_a, tl_a), evs_a = exp._probe_features_bn_train(
        obj, state, train, [test], batch_size=32, seed=5)
    (tf_b, tl_b), evs_b = exp._probe_features_bn_train(
        obj, state, ResidentSplit(train), [ResidentSplit(test)], batch_size=32, seed=5)
    np.testing.assert_array_equal(tl_a, np.asarray(tl_b))
    np.testing.assert_allclose(tf_a, np.asarray(tf_b), rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(evs_a[0][0], np.asarray(evs_b[0][0]),
                               rtol=2e-2, atol=2e-3)


def test_segmented_resident_epoch_matches_uncapped(synthetic_arrays, monkeypatch):
    """AVMNIST_MAX_SCAN_STEPS segments the epoch into several scan programs;
    the training math is unchanged (same epoch rng key; step_fns fold
    state.step, so streams are identical across the segment boundary)."""
    train, _ = synthetic_arrays
    obj = make_centralnet_objective(channels=4, learning_rate=1e-3)
    state_a, hist_a = fit(obj, ResidentSplit(train), epochs=2, batch_size=32, seed=5)
    monkeypatch.setenv("AVMNIST_MAX_SCAN_STEPS", "3")  # 8 steps -> 3+3+2 segments
    state_b, hist_b = fit(obj, ResidentSplit(train), epochs=2, batch_size=32, seed=5)
    monkeypatch.delenv("AVMNIST_MAX_SCAN_STEPS")
    for x, y in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert abs(hist_a[-1]["train_loss"] - hist_b[-1]["train_loss"]) < 1e-6


def test_resident_epoch_over_mesh(synthetic_arrays):
    """run_epoch_resident over an explicit 8-device (data, model) mesh — the
    production multi-chip input path (resident_gather's with_sharding_constraint
    onto the data axis + psum'd grads). This is the mesh-resident coverage the
    driver dryrun (__graft_entry__._dryrun_impl) used to re-compile a third
    giant program for (VERDICT r3 #1); here it runs on the identical
    8-virtual-device CPU backend with a cheap objective. Asserts the meshed
    epoch matches the un-meshed resident epoch on the same (seed, epoch) plan."""
    from avmnist_tpu.parallel import create_mesh, replicate_state
    from avmnist_tpu.train.loops import run_epoch_resident

    train, _ = synthetic_arrays
    mesh = create_mesh(n_data=8, n_model=1, devices=jax.devices()[:8])
    obj = make_centralnet_objective(channels=4, learning_rate=1e-3,
                                    compute_dtype=jax.numpy.float32)

    state0 = obj.init_fn(jax.random.key(0))
    state_m, means_m, _ = run_epoch_resident(
        obj, replicate_state(state0, mesh), ResidentSplit(train, mesh),
        batch_size=32, seed=5, epoch=0, rng=jax.random.key(1), mesh=mesh)
    assert np.isfinite(means_m["train_loss"]), means_m

    state_s, means_s, _ = run_epoch_resident(
        obj, state0, ResidentSplit(train), batch_size=32, seed=5, epoch=0,
        rng=jax.random.key(1))
    assert abs(means_m["train_loss"] - means_s["train_loss"]) < 5e-4
    # psum's tree reduction legitimately rounds differently from the
    # single-program sum -> trajectory-level (norm) equivalence, not elementwise
    num = sum(float(np.linalg.norm(np.asarray(x) - np.asarray(y)) ** 2)
              for x, y in zip(jax.tree.leaves(state_m.params),
                              jax.tree.leaves(state_s.params))) ** 0.5
    den = sum(float(np.linalg.norm(np.asarray(x)) ** 2)
              for x in jax.tree.leaves(state_s.params)) ** 0.5
    assert num / den < 1e-2, f"meshed epoch diverged: rel norm diff {num / den}"
