"""Supervised sanity check: can an encoder + linear head fit the synth corpus?

Splits "encoder architecture broken" from "DINO dynamics broken" when bisecting
(VERDICT r2 Weak #1). Trains encoder -> Dense(10) with CE for a few epochs.

    python scripts/sanity_supervised_encoder.py --model multi_dual_vit --dtype bf16
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="multi_dual_vit")
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--n_train", type=int, default=12800)
    ap.add_argument("--batch_size", type=int, default=128)
    args = ap.parse_args()

    from avmnist_tpu.config.schema import load_config
    from avmnist_tpu.data.datasets import DataSplit
    from avmnist_tpu.models.registry import build_encoder, is_unimodal
    from avmnist_tpu.objectives.common import (cast_tree, cross_entropy,
                                               normalize_audio, normalize_images)
    from avmnist_tpu.train.experiment import load_experiment_data

    cdtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    config = load_config("configs/config_parity_synth.yaml")
    train_split, val_split, _ = load_experiment_data(config)
    sub = DataSplit(train_split.arrays, train_split.indices[: args.n_train])
    vsub = DataSplit(val_split.arrays, val_split.indices[:2000])

    kw = {} if is_unimodal(args.model) else {"encoder_output_dim": 256}
    encoder = build_encoder(args.model, output_dim=256, **kw)

    class Net(nn.Module):
        encoder: nn.Module

        @nn.compact
        def __call__(self, img, aud, train=True):
            f = self.encoder(img, aud, train=train)
            return nn.Dense(10)(f)

    net = Net(encoder=encoder)
    img0 = jnp.zeros((2, 28, 28, 1))
    aud0 = jnp.zeros((2, 112, 112, 1))
    rng = jax.random.key(0)
    variables = net.init({"params": rng, "dropout": rng}, img0, aud0, train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, batch, rng):
        def loss_fn(p):
            v = {"params": cast_tree(p, cdtype), "batch_stats": cast_tree(stats, cdtype)}
            logits, upd = net.apply(
                v, normalize_images(batch["image"]).astype(cdtype),
                normalize_audio(batch["audio"]).astype(cdtype), train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            return cross_entropy(logits, batch["label"]), cast_tree(
                upd["batch_stats"], jnp.float32)

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    @jax.jit
    def acc_fn(params, stats, batch):
        v = {"params": params, "batch_stats": stats}
        logits = net.apply(v, normalize_images(batch["image"]),
                           normalize_audio(batch["audio"]), train=False)
        return (logits.argmax(-1) == batch["label"]).mean()

    n_steps = args.n_train // args.batch_size
    for epoch in range(args.epochs):
        order = np.random.RandomState(epoch).permutation(args.n_train)
        losses = []
        for s in range(n_steps):
            idx = order[s * args.batch_size:(s + 1) * args.batch_size]
            batch = sub.gather(idx)
            rng, k = jax.random.split(rng)
            params, stats, opt_state, loss = step(params, stats, opt_state, batch, k)
            losses.append(loss)
        accs = []
        for s in range(len(vsub) // args.batch_size):
            b = vsub.gather(np.arange(s * args.batch_size, (s + 1) * args.batch_size))
            accs.append(acc_fn(params, stats, b))
        print(json.dumps({"model": args.model, "dtype": args.dtype, "epoch": epoch,
                          "loss": round(float(jnp.stack(losses).mean()), 4),
                          "val_acc": round(100 * float(jnp.stack(accs).mean()), 2)}),
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
