"""Experiment drivers: the run_dino.py / ssl_train.py / benchmarks.ipynb orchestration
rebuilt over the functional core.

Artifact layout parity (SURVEY.md appendix):
``{model_dir_scratch}/{model}_{metric}_{ddmmYYYY_HHMMSS}/`` with config copy,
``logs_seed{N}/version_*/metrics.csv``, checkpoints, ``downstream/`` logs;
``{model_dir_data}/...`` with ``final_results_*.csv``, ``performance_summary.txt``,
``pca_plots/``, ``confusion_matrix/``.
"""
from __future__ import annotations

import copy
import dataclasses
import os
import time
from datetime import datetime
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from avmnist_tpu.data.datasets import Batches, split_train_val
from avmnist_tpu.data.memmap import load_avmnist
from avmnist_tpu.data.resident import ResidentSplit, as_resident
from avmnist_tpu.eval.metrics import (
    compute_classification_metrics,
    write_performance_summary,
    write_prediction_csv,
)
from avmnist_tpu.eval.probes import extract_features, knn_probe, train_linear_probe
from avmnist_tpu.objectives.common import Objective
from avmnist_tpu.train.checkpoint import (BestCheckpointer, is_finalized,
                                          load_checkpoint, load_last, save_last)
from avmnist_tpu.train.loops import fit
from avmnist_tpu.utils.logging import CSVLogger
from avmnist_tpu.utils.reproducibility import set_seed


def run_dir_name(model_name: str, metric: str) -> str:
    """``{model}_{metric}_{ddmmYYYY_HHMMSS}`` (reference run_dino.py:600-610)."""
    return f"{model_name}_{metric}_{datetime.now().strftime('%d%m%Y_%H%M%S')}"


def load_experiment_data(config: Dict, compute_stats: bool = False):
    """Eval-side data: train/val split + test (reference AVMNISTDataModule)."""
    data_dir = config["data"]["data_dir"]
    scheme = config["hyperparameters"].get("data_augmentation", "burst_noise")
    train = load_avmnist(data_dir, "train", scheme, compute_stats=compute_stats)
    test = load_avmnist(data_dir, "test", scheme)
    test.audio_mean, test.audio_std = train.audio_mean, train.audio_std
    train_split, val_split = split_train_val(
        train, config.get("data", {}).get("train_size", 55000),
        config.get("data", {}).get("val_size", 5000),
        seed=config["experiment"].get("seed", 1))
    return train_split, val_split, test


def _resident_feature_prog(objective: Objective, key, build):
    """Cached jitted whole-split scan programs for probe feature extraction —
    rebuilt lambdas would retrace every epoch, so programs key off the stable
    (objective, fn) pair and live in objective.meta."""
    cache = objective.meta.setdefault("_feat_progs", {})
    if key not in cache:
        cache[key] = build()
    return cache[key]


def _probe_features(objective: Objective, state, data, batch_size=256, feature_fn=None):
    fn = feature_fn or objective.feature_fn
    if isinstance(data, ResidentSplit):
        import jax.numpy as jnp

        def build():
            @jax.jit
            def prog(state, arrays, plan):
                def body(_, idx):
                    batch = {k: v[idx] for k, v in arrays.items()}
                    return None, fn(state, batch)

                _, feats = jax.lax.scan(body, None, plan)
                return feats.reshape((-1,) + feats.shape[2:])

            return prog

        prog = _resident_feature_prog(objective, ("feat", id(fn), batch_size), build)
        plan, _ = data.eval_index(batch_size)
        feats = prog(state, data.arrays, jnp.asarray(plan))[: data.n]
        return feats, data.host_labels
    batches = Batches(data, batch_size=batch_size, shuffle=False,
                      drop_remainder=True, pad_final=True)
    return extract_features(lambda b: fn(state, b), batches)


def _probe_features_bn_train(objective: Objective, state, train_data, eval_datas,
                             batch_size=256, seed=0):
    """Reference-exact probe-BN semantics (dino.py:888-917, VERDICT.md Missing #6):
    train-split features come from a TRAIN-mode encoder pass (per-batch BN stats +
    active dropout) that also updates a probe-local copy of the running stats; the
    eval splits are then extracted in eval mode with those UPDATED stats.

    Deliberate simplifications vs the reference (documented in DEVIATIONS.md):
    features are extracted once and cached (the reference re-runs the frozen encoder
    every probe epoch, re-rolling dropout and the dataloader shuffle — pure noise on
    frozen params), and the train-split batch partition is the fixed eval order.
    Returns ((train_feats, train_labels), [per-eval-split (feats, labels)]).
    """
    import jax

    from avmnist_tpu.data.datasets import prefetch_to_device

    fn_train = objective.meta["feature_fn_train"]
    fn_stats = objective.meta["feature_fn_stats"]
    stats = objective.meta["initial_probe_stats"](state)
    rng = jax.random.key(seed)
    if isinstance(train_data, ResidentSplit):
        import jax.numpy as jnp

        def build_train():
            @jax.jit
            def prog(state, arrays, plan, rng, stats):
                def body(stats, args):
                    i, idx = args
                    batch = {k: v[idx] for k, v in arrays.items()}
                    f, stats = fn_train(state, batch, jax.random.fold_in(rng, i), stats)
                    return stats, f

                stats, feats = jax.lax.scan(
                    body, stats, (jnp.arange(plan.shape[0]), plan))
                return feats.reshape((-1,) + feats.shape[2:]), stats

            return prog

        def build_stats():
            @jax.jit
            def prog(state, arrays, plan, stats):
                def body(_, idx):
                    batch = {k: v[idx] for k, v in arrays.items()}
                    return None, fn_stats(state, batch, stats)

                _, feats = jax.lax.scan(body, None, plan)
                return feats.reshape((-1,) + feats.shape[2:])

            return prog

        prog_t = _resident_feature_prog(objective, ("bn_train", batch_size), build_train)
        prog_s = _resident_feature_prog(objective, ("bn_stats", batch_size), build_stats)
        plan, _ = train_data.eval_index(batch_size)
        feats, stats = prog_t(state, train_data.arrays, jnp.asarray(plan), rng, stats)
        train_out = (feats[: train_data.n], train_data.host_labels)
        eval_outs = []
        for d in eval_datas:
            eplan, _ = d.eval_index(batch_size)
            ef = prog_s(state, d.arrays, jnp.asarray(eplan), stats)[: d.n]
            eval_outs.append((ef, d.host_labels))
        return train_out, eval_outs
    # Stats chain sequentially on device; features stay on device until one final
    # device_get (per-batch syncs serialize the loop under the axon TPU relay).
    dev = []
    for i, batch in enumerate(prefetch_to_device(
            Batches(train_data, batch_size=batch_size, shuffle=False,
                    drop_remainder=True, pad_final=True), size=2)):
        f, stats = fn_train(state, batch, jax.random.fold_in(rng, i), stats)
        dev.append((f, batch["label"], batch.get("valid", None)))
    feats, labels = [], []
    for f, lab, valid in jax.device_get(dev):
        valid = int(valid) if valid is not None else len(lab)
        feats.append(np.asarray(f)[:valid])
        labels.append(np.asarray(lab)[:valid])
    train_out = (np.concatenate(feats), np.concatenate(labels))
    eval_outs = [
        extract_features(lambda b: fn_stats(state, b, stats),
                         Batches(d, batch_size=batch_size, shuffle=False,
                                 drop_remainder=True, pad_final=True))
        for d in eval_datas
    ]
    return train_out, eval_outs


def compute_accuracies(
    objective: Objective,
    state,
    train_split,
    val_split,
    test,
    batch_size: int = 256,
    downstream_epochs: int = 10,
    downstream_lr: float = 1e-3,
    seed: int = 0,
    out_dir: Optional[str] = None,
    model_name: str = "model",
    feature_fn=None,
    probe_bn_mode: str = "eval",
) -> Tuple[float, float, Dict]:
    """kNN + 10-epoch MLP probes on frozen features (run_dino.py:481-501:
    train_knn_classifier on train->test; train_downstream with best-val selection,
    accuracy reported on test). Features are extracted ONCE and cached.
    ``probe_bn_mode="train"`` uses reference-exact train-mode BN for the train-split
    features (see _probe_features_bn_train)."""
    if probe_bn_mode == "train" and "feature_fn_train" in objective.meta:
        (tf, tl), ((vf, vl), (sf, sl)) = _probe_features_bn_train(
            objective, state, train_split, [val_split, test], batch_size, seed)
    else:
        tf, tl = _probe_features(objective, state, train_split, batch_size, feature_fn)
        vf, vl = _probe_features(objective, state, val_split, batch_size, feature_fn)
        sf, sl = _probe_features(objective, state, test, batch_size, feature_fn)

    knn = knn_probe(tf, tl, sf, sl, k=5)
    mlp = train_linear_probe(tf, tl, sf, sl, epochs=downstream_epochs,
                             learning_rate=downstream_lr, seed=seed,
                             select_feats=vf, select_labels=vl)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        write_prediction_csv(os.path.join(out_dir, f"{model_name}_test_log.csv"),
                             sl, mlp["preds"], mlp["probs"])
    return knn["accuracy"], mlp["accuracy"], mlp


def make_mlp_probe_hook(objective: Objective, train_split, val_split,
                        batch_size: int = 256, learning_rate: float = 1e-4,
                        probe_bn_mode: str = "eval"):
    """Per-epoch 1-epoch MLP probe logging ``mlp_acc``/``val_loss`` — the reference's
    on_train_epoch_end (dino.py:878-951), restructured to train on cached frozen
    features (the encoder is frozen during the probe, so re-running it per batch as
    the reference does is redundant compute). ``probe_bn_mode="train"`` reproduces
    the reference's train-mode BN probe semantics exactly."""

    def hook(epoch: int, state, metrics: Dict) -> Dict:
        if probe_bn_mode == "train" and "feature_fn_train" in objective.meta:
            (tf, tl), [(vf, vl)] = _probe_features_bn_train(
                objective, state, train_split, [val_split], batch_size, seed=epoch)
        else:
            tf, tl = _probe_features(objective, state, train_split, batch_size)
            vf, vl = _probe_features(objective, state, val_split, batch_size)
        out = train_linear_probe(tf, tl, vf, vl, epochs=1,
                                 learning_rate=learning_rate, seed=epoch)
        return {"mlp_acc": out["accuracy"], "val_loss": out["train_loss"]}

    return hook


@dataclasses.dataclass
class SeedResult:
    seed: int
    knn_acc: float
    mlp_acc: float
    history: List[Dict]
    training_time: float
    gates: Optional[Dict[str, float]] = None  # learned modality gates, if present
    phases: Optional[Dict[str, float]] = None  # wall-clock breakdown (VERDICT r3 #7)


def extract_gates(state) -> Optional[Dict[str, float]]:
    """Final sigmoid-gate scalars from gated encoders (run_dino.py:454-465 writes
    final_audio_gate/final_image_gate into performance_summary.txt)."""
    try:
        enc = state.params.get("encoder", {})
        if "gate_image" in enc:
            return {"final_image_gate": float(np.asarray(enc["gate_image"])),
                    "final_audio_gate": float(np.asarray(enc["gate_audio"]))}
    except Exception:
        pass
    return None


def run_seeds(
    make_objective: Callable[[], Objective],
    config: Dict,
    train_split,
    val_split,
    test,
    model_dir_scratch: str,
    model_name: str,
    metric: str = "mlp_acc",
    epochs: Optional[int] = None,
    mesh=None,
    seeds: Sequence[int] = (1, 2, 3),
    probe_hook: bool = True,
    feature_fn=None,
) -> List[SeedResult]:
    """The multi-seed loop shared by every workload (run_dino.py:347-398,
    ssl_train.py:115-201): same initial weights each seed (the reference reloads
    ``initial_model_weights``), per-seed CSVLogger ``logs_seed{N}``, best-metric
    checkpoint, post-training kNN + MLP probes."""
    hp = config["hyperparameters"]
    epochs = epochs or hp["num_epochs"]
    probe_bn_mode = ("train" if config.get("reference_faithful", {})
                     .get("probe_bn_train_mode", False) else "eval")
    if config.get("data", {}).get("resident", True):
        # One-time HBM placement of all three splits (data/resident.py): epochs
        # and probes then run as whole-split scans with no per-batch H2D.
        train_split = as_resident(train_split, mesh)
        val_split = as_resident(val_split, mesh)
        test = as_resident(test, mesh)
    results = []
    objective = make_objective()
    init_state = objective.init_fn(jax.random.key(config["experiment"].get("seed", 1)))
    # Mid-run checkpoint/resume (beyond the reference — SURVEY.md §5): save a
    # rolling `last` checkpoint every K epochs and resume a killed run exactly
    # (resident path). Opt-in via experiment.save_last_every / resume_from_last
    # or the matching AVMNIST_* env vars (ops knobs for queue scripts).
    exp_cfg = config.get("experiment", {})
    save_last_every = int(os.environ.get("AVMNIST_SAVE_LAST_EVERY",
                                         exp_cfg.get("save_last_every", 0)))
    resume_last = (os.environ.get("AVMNIST_RESUME_LAST") == "1"
                   or bool(exp_cfg.get("resume_from_last", False)))
    for seed in seeds:
        set_seed(seed)
        state = jax.tree.map(lambda x: x, init_state)  # same init every seed
        logger = CSVLogger(model_dir_scratch, name=f"logs_seed{seed}")
        logger.log_hyperparams(hp)
        ckpt_dir = os.path.join(model_dir_scratch, f"ckpt_seed{seed}")
        ckpt = BestCheckpointer(ckpt_dir, monitor=metric,
                                mode="max" if metric == "mlp_acc" else "min")
        start_epoch, fit_rng = 0, None
        if resume_last:
            restored = load_last(ckpt_dir, init_state)
            if restored is not None:
                state, last_epoch, fit_rng, ckpt.best = restored
                start_epoch = last_epoch + 1
                # Re-adopt `best` only when it is a COMPLETE checkpoint: a
                # watchdog SIGKILL mid-save leaves an unfinalized dir that
                # would crash the end-of-training reload (ADVICE r3).
                if ckpt.best is not None and is_finalized(
                        os.path.join(ckpt_dir, "best")):
                    ckpt.best_path = os.path.join(ckpt_dir, "best")
        checkpoint_hook = None
        if save_last_every:
            def checkpoint_hook(epoch, st, rng, _dir=ckpt_dir, _ckpt=ckpt):
                if (epoch + 1) % save_last_every == 0:
                    save_last(_dir, st, epoch, rng, _ckpt.best)
        hook = (make_mlp_probe_hook(objective, train_split, val_split,
                                    learning_rate=hp.get("learning_rate", 1e-4),
                                    probe_bn_mode=probe_bn_mode)
                if probe_hook else None)

        def on_epoch_end(epoch, st, metrics):
            extra = hook(epoch, st, metrics) if hook else {}
            merged = {**metrics, **extra}
            if metric in merged:
                ckpt.update(merged, st)
            return extra

        t0 = time.time()
        state, history = fit(
            objective, train_split, epochs=epochs, batch_size=hp["batch_size"],
            seed=seed, mesh=mesh, logger=logger, on_epoch_end=on_epoch_end,
            state=state, start_epoch=start_epoch, rng=fit_rng,
            checkpoint_hook=checkpoint_hook)
        training_time = time.time() - t0
        if ckpt.best_path:
            state = load_checkpoint(ckpt.best_path, state)
        t1 = time.time()
        knn_acc, mlp_acc, _ = compute_accuracies(
            objective, state, train_split, val_split, test,
            downstream_lr=1e-3, seed=seed,
            out_dir=os.path.join(model_dir_scratch, "downstream"),
            model_name=f"{model_name}_seed{seed}", feature_fn=feature_fn,
            probe_bn_mode=probe_bn_mode)
        # phase breakdown (VERDICT r3 #7): steady = epochs at the median
        # epoch_time; training_time - steady = JIT compile + host overhead;
        # downstream probes timed separately. Lands in final_results CSV.
        times = sorted(h.get("epoch_time", 0.0) for h in history) or [0.0]
        seed_phases = {
            "steady_train_time": times[len(times) // 2] * len(times),
            "downstream_probe_time": time.time() - t1,
        }
        results.append(SeedResult(seed, knn_acc, mlp_acc, history, training_time,
                                  gates=extract_gates(state), phases=seed_phases))
    return results


def summarize_experiment(
    results: List[SeedResult],
    config: Dict,
    model_dir_data: str,
    model_name: str,
    extra_summary: Optional[Dict[str, Any]] = None,
    augment_dump: Optional[str] = None,
) -> Dict[str, Any]:
    """final_results CSV + performance_summary.txt (run_dino.py:434-479 formats)."""
    os.makedirs(model_dir_data, exist_ok=True)
    knn = [r.knn_acc for r in results]
    mlp = [r.mlp_acc for r in results]
    hp = config["hyperparameters"]
    row = {
        "model": model_name,
        "learning_rate": hp.get("learning_rate"),
        "batch_size": hp.get("batch_size"),
        "momentum": hp.get("momentum"),
        "center_momentum": hp.get("center_momentum"),
        "projection_dim": hp.get("projection_dim"),
        "output_dim": hp.get("output_dim"),
        "data_augmentation": hp.get("data_augmentation", "burst_noise"),
        "n_global_views": hp.get("n_global_views"),
        "n_local_views": hp.get("n_local_views"),
        "downstream_knn_accuracy": float(np.mean(knn)),
        "downstream_knn_accuracy_std": float(np.std(knn)),
        "downstream_mlp_acc": float(np.mean(mlp)),
        "downstream_mlp_acc_std": float(np.std(mlp)),
        "total_training_time": results[-1].training_time,
        **{k: round(v, 2) for k, v in (results[-1].phases or {}).items()},
        "timestamp": datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
    }
    import csv

    path = os.path.join(model_dir_data, f"final_results_{model_name}.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row))
        w.writeheader()
        w.writerow(row)

    lines = [f"{k}: {v}" for k, v in (extra_summary or {}).items()]
    if augment_dump:
        lines += ["", "# Augmentation Summary", augment_dump]
    write_performance_summary(
        os.path.join(model_dir_data, "performance_summary.txt"), model_name,
        {"downstream_knn_accuracy": knn, "downstream_mlp_acc": mlp},
        extra_lines=lines)
    return row
