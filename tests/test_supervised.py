import os

import jax
import numpy as np
import pytest

from avmnist_tpu.data import Batches, split_train_val
from avmnist_tpu.objectives.supervised import (
    make_centralnet_objective,
    make_unimodal_objective,
)
from avmnist_tpu.train.checkpoint import BestCheckpointer, load_checkpoint, save_checkpoint
from avmnist_tpu.train.loops import evaluate, fit
from avmnist_tpu.utils.logging import CSVLogger, MetadataCSV


@pytest.mark.slow
def test_centralnet_learns_synthetic(synthetic_arrays, mesh8, tmp_path):
    train, test = synthetic_arrays
    obj = make_centralnet_objective(channels=4, learning_rate=1e-3)
    logger = CSVLogger(str(tmp_path), "logs_seed1")
    state, history = fit(
        obj, train, epochs=6, batch_size=32, seed=1, mesh=mesh8,
        val_data=test, logger=logger,
    )
    assert len(history) == 6
    # learnable synthetic signal: accuracy should exceed chance (10%)
    final = evaluate(obj, state, Batches(test, 32, shuffle=False, pad_final=True), mesh8)
    assert final["accuracy"] > 25.0, f"no learning: {final['accuracy']}"
    assert np.isfinite(final["loss"])
    assert final["probs"].shape[1] == 10
    # Lightning-style metrics.csv exists with expected columns
    path = logger.metrics_path
    assert os.path.exists(path)
    head = open(path).readline()
    assert "train_loss" in head and "epoch" in head


@pytest.mark.slow
def test_unimodal_objectives_run(synthetic_arrays, mesh8):
    train, test = synthetic_arrays
    for modality in ("image", "audio"):
        obj = make_unimodal_objective(modality, learning_rate=1e-3, num_epochs=2,
                                      steps_per_epoch=8)
        state, history = fit(obj, train, epochs=2, batch_size=32, seed=1, mesh=mesh8)
        assert np.isfinite(history[-1]["train_loss"])


def test_checkpoint_roundtrip(synthetic_arrays, tmp_path):
    train, _ = synthetic_arrays
    obj = make_centralnet_objective(channels=4)
    state = obj.init_fn(jax.random.key(0))
    p = save_checkpoint(str(tmp_path / "ck"), state)
    restored = load_checkpoint(p, state)
    orig = jax.tree.leaves(state.params)
    back = jax.tree.leaves(restored.params)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_checkpointer(tmp_path, synthetic_arrays):
    obj = make_centralnet_objective(channels=4)
    state = obj.init_fn(jax.random.key(0))
    bc = BestCheckpointer(str(tmp_path), monitor="mlp_acc", mode="max")
    assert bc.update({"mlp_acc": 10.0}, state)
    assert not bc.update({"mlp_acc": 5.0}, state)
    assert bc.update({"mlp_acc": 15.0}, state)
    assert bc.best == 15.0 and os.path.isdir(bc.best_path)


def test_metadata_csv(tmp_path):
    path = str(tmp_path / "log.csv")
    m = MetadataCSV(path, ["epoch", "loss"], {"optimizer": "Adam", "lr": 0.001})
    m.append([1, 0.5])
    lines = open(path).read().splitlines()
    assert lines[0].startswith("epoch,loss")
    assert "Adam" in lines[0]  # metadata embedded in header row (reference format)
    assert lines[1] == "1,0.5"
