import os

import jax
import jax.numpy as jnp
import numpy as np


def test_config_roundtrip(tmp_path):
    from avmnist_tpu.config import default_config, load_config, save_config, update_hardware_config

    cfg = default_config()
    assert cfg["hyperparameters"]["momentum"] == 0.996
    p = str(tmp_path / "c.yaml")
    cfg["hyperparameters"]["learning_rate"] = 5e-4
    save_config(cfg, p)
    loaded = load_config(p)
    assert loaded["hyperparameters"]["learning_rate"] == 5e-4
    os.environ["SLURM_CPUS_PER_TASK"] = "4"
    try:
        assert update_hardware_config(loaded)["hardware"]["num_workers"] == 4
    finally:
        del os.environ["SLURM_CPUS_PER_TASK"]


def test_diagnostics_recorder():
    from avmnist_tpu.utils.debugging import (
        DiagnosticsRecorder,
        gradient_norms,
        student_teacher_similarity,
        tree_finite,
        weight_stats,
    )

    grads = {"encoder": {"w": jnp.ones((3, 3))}, "projection": {"w": jnp.zeros((2,))}}
    norms = gradient_norms(grads)
    assert abs(norms["encoder"] - 3.0) < 1e-6
    assert norms["__global__"] > 0
    assert tree_finite(grads)
    assert not tree_finite({"x": jnp.array([jnp.nan])})
    ws = weight_stats(grads)
    assert any("encoder" in k for k in ws)
    s = student_teacher_similarity(jnp.ones((4, 8)), jnp.ones((4, 8)))
    assert abs(s - 1.0) < 1e-5
    rec = DiagnosticsRecorder()
    rec.record_step(0, 2.0, grads=grads, center=jnp.ones((1, 4)), similarity=0.5)
    rec.record_step(1, float("nan"))
    report = rec.report()
    assert "NON-FINITE" in report and "grad norms" in report


def test_activation_stats():
    from flax import linen as nn

    from avmnist_tpu.utils.debugging import activation_stats

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.relu(nn.Dense(4)(x))

    m = M()
    v = m.init(jax.random.key(0), jnp.ones((2, 3)))
    stats = activation_stats(m, v, jnp.ones((2, 3)))
    assert stats  # at least one layer recorded
    assert all({"mean", "dead_frac"} <= set(s) for s in stats.values())


def test_profiling_utils():
    from avmnist_tpu.utils.profiling import StepTimer, calculate_gflops, param_count

    t = StepTimer()
    t.tick(128)
    t.tick(128)
    s = t.stats()
    assert s["items_per_sec"] > 0 and s["steps_per_sec"] > 0
    g, total = calculate_gflops(lambda x: x @ x.T, jnp.ones((4, 8)))
    # CPU backend may not report flops; both None or positive are valid
    assert (g is None) or g > 0
    assert param_count({"a": jnp.ones((3, 4))}) == 12


def test_pretrain_loop(synthetic_arrays, tmp_path):
    from avmnist_tpu.objectives.supervised import make_unimodal_objective
    from avmnist_tpu.train.pretrain import pretrain

    train, _ = synthetic_arrays
    obj = make_unimodal_objective("image", learning_rate=1e-3)
    state, path = pretrain(obj, train, num_epochs=2, batch_size=64,
                           save_path=str(tmp_path / "m"),
                           log_path=str(tmp_path / "log.csv"), seed=1)
    logs = [f for f in os.listdir(tmp_path) if f.startswith("log")]
    assert logs
    content = open(tmp_path / logs[0]).read()
    assert "train_loss" in content and "epoch" in content
    assert any(os.path.isdir(tmp_path / d) for d in os.listdir(tmp_path)
               if d.startswith("m_"))


def test_reevaluate_discovery(tmp_path):
    from avmnist_tpu.eval.reevaluate import discover_checkpoints

    (tmp_path / "ckpt_seed1" / "best").mkdir(parents=True)
    (tmp_path / "final_seed2").mkdir()
    found = discover_checkpoints(str(tmp_path))
    assert found[1].endswith("ckpt_seed1/best")
    assert found[2].endswith("final_seed2")


def test_reevaluate_end_to_end(synthetic_arrays, tmp_path):
    import jax

    from avmnist_tpu.data import split_train_val
    from avmnist_tpu.eval.reevaluate import evaluate_models
    from avmnist_tpu.objectives.infonce import InfoNCEConfig, make_infonce_objective
    from avmnist_tpu.train.checkpoint import save_checkpoint

    train, test = synthetic_arrays
    train_split, val_split = split_train_val(train, 200, 56, seed=1)
    obj = make_infonce_objective(InfoNCEConfig(output_dim=16, projection_dim=8))
    state = obj.init_fn(jax.random.key(0))
    run_dir = tmp_path / "run"
    save_checkpoint(str(run_dir / "ckpt_seed1" / "best"), state)
    results = evaluate_models(obj, state, str(run_dir), train_split, val_split, test,
                              downstream_epochs=2)
    assert set(results) == {1}
    assert np.isfinite(results[1]["knn_acc"]) and np.isfinite(results[1]["mlp_acc"])


def test_centralnet_aux_ops():
    from avmnist_tpu.models.centralnet_aux import (
        Maxout,
        alpha_blend,
        global_pooling_2d,
        pad_features,
    )

    x = jnp.ones((2, 4, 4, 3))
    assert global_pooling_2d(x).shape == (2, 3)
    f = jnp.ones((2, 4))
    assert pad_features(f, 6).shape == (2, 6)
    assert float(pad_features(f, 6)[0, 5]) == 0.0
    blended = alpha_blend(jnp.ones((2, 4)), jnp.ones((2, 6)), 2.0, 3.0)
    assert blended.shape == (2, 6)
    m = Maxout(features=5, k=2)
    v = m.init(jax.random.key(0), jnp.ones((2, 8)))
    assert m.apply(v, jnp.ones((2, 8))).shape == (2, 5)


def test_legacy_multimodal_vit():
    from avmnist_tpu.models.vit import LegacyMultiModalViTEncoder

    m = LegacyMultiModalViTEncoder(output_dim=32)
    img = jnp.zeros((2, 28, 28, 1))
    aud = jnp.zeros((2, 112, 112, 1))
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
               img, aud, train=False)
    out = m.apply(v, img, aud, train=False)
    assert out.shape == (2, 32)


def test_diagnostics_figure_report(tmp_path):
    """Figure-emitting comprehensive report (reference debugging.py:245-698 visual
    parity): grad-flow/loss/similarity/center PNGs + weight hists + report.html."""
    import jax
    import jax.numpy as jnp
    from avmnist_tpu.utils import debugging as D

    rec = D.DiagnosticsRecorder()
    rng = np.random.default_rng(0)
    grads = {"encoder": {"kernel": jnp.ones((4, 4))},
             "projection": {"kernel": jnp.ones((4,)) * 2}}
    for step in range(8):
        rec.record_step(step, float(rng.normal() + 3), grads=grads,
                        center=jnp.ones((1, 8)) * step,
                        similarity=0.5 + 0.05 * step)
    out = tmp_path / "debug"
    params = {"layer": {"kernel": jnp.asarray(rng.normal(size=(32, 16)))}}
    text = rec.report(str(out), params=params)
    assert "grad norms" in text
    produced = {p.name for p in out.iterdir()}
    for want in ("report.txt", "report.html", "loss_curve.png",
                 "gradient_norms.png", "gradient_flow.png",
                 "student_teacher_similarity.png", "center_updates.png",
                 "weight_distributions.png"):
        assert want in produced, want


def test_feature_maps_and_tsne(tmp_path):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from avmnist_tpu.utils.debugging import plot_embeddings_tsne, plot_feature_maps

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(4, (3, 3))(x)
            return x.mean(axis=(1, 2, 3))

    m = Tiny()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 1)), jnp.float32)
    variables = m.init(jax.random.key(0), x)
    p = plot_feature_maps(m, variables, x, out_dir=str(tmp_path))
    assert p is not None and p.endswith("feature_maps.png")

    s = np.random.default_rng(1).normal(size=(20, 8))
    t = s + 0.1 * np.random.default_rng(2).normal(size=(20, 8))
    p = plot_embeddings_tsne(s, t, str(tmp_path))
    assert p is not None and p.endswith("embeddings_tsne.png")
