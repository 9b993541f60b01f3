"""Frozen-feature probes: linear (MLP) probe + kNN.

Reference behavior being matched:
- ``DownstreamClassifier`` (dino.py:1764-1814): frozen deep-copied student encoder +
  Linear(out_dim->128)->ReLU->Linear(128->10); trained with AdamW + cosine
  (train_downstream, dino_train.py:188-329; the per-epoch probe trains 1 epoch,
  dino.py:878-951).
- ``train_knn_classifier`` (dino_train.py:331-368): sklearn KNeighborsClassifier(n=5)
  on frozen features.

TPU-native design: features are extracted ONCE per probe (the encoder is frozen, so
re-running it per probe batch — as the reference does — is pure waste); the probe MLP
trains as a jitted ``lax.scan`` over shuffled minibatches of cached features, and kNN
is a brute-force distance matrix + top-k on device (55k x 10k x 256 is tiny for the MXU).
Features are extracted in eval mode (running BN stats) — a documented simplification
of the reference's train-mode probe encoder (SURVEY.md §7 hard-part 4).
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from avmnist_tpu.models.layers import MLPHead
from avmnist_tpu.train.optim import torch_adamw


def extract_features(feature_fn: Callable, batches: Iterable[Dict]) -> Tuple[np.ndarray, np.ndarray]:
    """Run a jitted feature_fn(batch) -> (B, D) over a split; returns (features, labels).

    Batches stream through the device prefetcher and every output stays on device
    until one device_get at the end — per-batch syncs serialized this loop under
    the axon TPU relay (probes run every epoch, so this is on the training path)."""
    from avmnist_tpu.data.datasets import prefetch_to_device

    dev = []
    for batch in prefetch_to_device(batches, size=2):
        dev.append((feature_fn(batch), batch["label"], batch.get("valid", None)))
    feats, labels = [], []
    for f, lab, valid in jax.device_get(dev):
        valid = int(valid) if valid is not None else len(lab)
        feats.append(np.asarray(f)[:valid])
        labels.append(np.asarray(lab)[:valid])
    return np.concatenate(feats), np.concatenate(labels)


@functools.lru_cache(maxsize=64)
def _probe_programs(d: int, hidden_dim: int, num_classes: int, batch_size: int,
                    steps_per_epoch: int, learning_rate: float, epochs: int):
    """Cached jitted (init, train_epoch, predict) for a probe configuration — the
    probe runs every epoch of every experiment, so recompiling per call would
    dominate wall-clock."""
    model = MLPHead(hidden_dim=hidden_dim, num_classes=num_classes)
    schedule = optax.cosine_decay_schedule(learning_rate, max(epochs, 1))
    # torch CosineAnnealingLR(T_max=epochs) stepped per epoch
    tx = torch_adamw(lambda step: schedule(step // steps_per_epoch), weight_decay=0.01)

    @jax.jit
    def init(rng):
        params = model.init(rng, jnp.zeros((1, d)))["params"]
        return params, tx.init(params)

    @jax.jit
    def train_epoch(params, opt_state, perm, xf, yf):
        def body(carry, idx):
            params, opt_state = carry
            xb, yb = xf[idx], yf[idx]

            def loss_fn(p):
                logits = model.apply({"params": p}, xb)
                return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        idxs = perm[: steps_per_epoch * batch_size].reshape(steps_per_epoch, batch_size)
        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), idxs)
        return params, opt_state, losses.mean()

    @jax.jit
    def predict(params, x):
        return model.apply({"params": params}, x)

    return init, train_epoch, predict


def train_linear_probe(
    train_feats: np.ndarray,
    train_labels: np.ndarray,
    val_feats: np.ndarray,
    val_labels: np.ndarray,
    num_classes: int = 10,
    epochs: int = 1,
    batch_size: int = 128,
    learning_rate: float = 1e-4,
    seed: int = 0,
    hidden_dim: int = 128,
    select_feats: Optional[np.ndarray] = None,
    select_labels: Optional[np.ndarray] = None,
) -> Dict:
    """MLP probe on cached features. Returns accuracy (%) + preds/probs.

    With ``select_feats/labels`` given, tracks per-epoch accuracy on that split and
    restores the best epoch's params before final evaluation — matching
    train_downstream's best-val-acc checkpoint selection (dino_train.py:274-314)."""
    d = train_feats.shape[1]
    n = len(train_feats)
    steps_per_epoch = max(n // batch_size, 1)
    init, train_epoch, predict = _probe_programs(
        d, hidden_dim, num_classes, batch_size, steps_per_epoch,
        float(learning_rate), epochs)
    params, opt_state = init(jax.random.key(seed))
    xf = jnp.asarray(train_feats)
    yf = jnp.asarray(train_labels)

    probe_rng = np.random.default_rng(seed)
    train_loss = np.nan
    best_acc, best_params = -1.0, params
    for _ in range(epochs):
        perm = jnp.asarray(probe_rng.permutation(n))
        params, opt_state, train_loss = train_epoch(params, opt_state, perm, xf, yf)
        if select_feats is not None:
            sel = np.asarray(jax.device_get(
                predict(params, jnp.asarray(select_feats)))).argmax(-1)
            acc = float((sel == select_labels).mean())
            if acc > best_acc:
                best_acc, best_params = acc, params
    if select_feats is not None:
        params = best_params

    logits = np.asarray(jax.device_get(predict(params, jnp.asarray(val_feats))))
    preds = logits.argmax(-1)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    acc = 100.0 * float((preds == val_labels).mean())
    return {
        "accuracy": acc,
        "preds": preds,
        "probs": probs,
        "labels": val_labels,
        "train_loss": float(jax.device_get(train_loss)),
        "params": params,
    }


@functools.partial(jax.jit, static_argnames=("k", "num_classes"))
def _knn_predict(train_f, train_y, test_f, k: int, num_classes: int):
    # Euclidean brute force: the Gram term rides the MXU.
    d2 = (
        jnp.sum(test_f**2, 1, keepdims=True)
        - 2.0 * test_f @ train_f.T
        + jnp.sum(train_f**2, 1)[None, :]
    )
    _, idx = jax.lax.top_k(-d2, k)
    votes = jax.nn.one_hot(train_y[idx], num_classes).sum(axis=1)
    # sklearn tie-break: np.argmax picks the smallest label among ties — jnp.argmax too.
    return jnp.argmax(votes, axis=-1)


def knn_probe(
    train_feats: np.ndarray,
    train_labels: np.ndarray,
    test_feats: np.ndarray,
    test_labels: np.ndarray,
    k: int = 5,
    num_classes: int = 10,
    block: int = 4096,
) -> Dict:
    """k-NN accuracy (%) on frozen features (reference: KNeighborsClassifier(n=5),
    dino_train.py:349-368). Blocked over test rows to bound the distance matrix."""
    train_f = jnp.asarray(train_feats)
    train_y = jnp.asarray(train_labels)
    preds = []
    for start in range(0, len(test_feats), block):
        tf = jnp.asarray(test_feats[start : start + block])
        preds.append(np.asarray(jax.device_get(
            _knn_predict(train_f, train_y, tf, k, num_classes))))
    preds = np.concatenate(preds)
    acc = 100.0 * float((preds == test_labels).mean())
    return {"accuracy": acc, "preds": preds, "labels": test_labels}
