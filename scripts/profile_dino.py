"""Decompose the DINO step cost (VERDICT r2 #4: 3.58x -> target >=8x per chip).

Times jitted sub-graphs of the DINO step separately on the ambient backend:
  - full step (augment + student fwd/bwd + teacher + EMA + Adam)
  - augmentation only (multi-crop view bank)
  - student forward+backward only (pre-made views)
  - teacher forward only
and scans batch size. One JSON line each.

    python scripts/profile_dino.py --model multi_central --batch 256 512 1024
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")


def timeit(fn, *args, iters=10):
    out = fn(*args)  # compile+warm
    jax.tree.map(lambda x: x.block_until_ready(), out)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])  # force through the relay
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="multi_central")
    ap.add_argument("--batch", type=int, nargs="+", default=[256])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from avmnist_tpu.data.synthetic import make_synthetic_avmnist
    from avmnist_tpu.objectives.common import normalize_audio, normalize_images
    from avmnist_tpu.objectives.dino import DinoConfig, make_dino_objective

    train, _ = make_synthetic_avmnist(n_train=1024, n_test=8, seed=0)

    for bs in args.batch:
        cfg = DinoConfig(model_name=args.model)
        obj = make_dino_objective(cfg)
        batch = {k: jax.device_put(v)
                 for k, v in train.gather(np.arange(bs) % 1024).items()}
        state = obj.init_fn(jax.random.key(0))
        augment = obj.meta["augment"]
        student = obj.meta["student"]

        # full step (scan of iters steps to amortize dispatch, like bench.py)
        @jax.jit
        def run_steps(state, key):
            def body(s, k):
                s, m = obj.step_fn(s, batch, k)
                return s, m["train_loss"]
            return jax.lax.scan(body, state, jax.random.split(key, args.iters))

        st, losses = run_steps(state, jax.random.key(1))
        _ = float(losses[-1])
        t0 = time.perf_counter()
        st, losses = run_steps(state, jax.random.key(2))
        _ = float(losses[-1])
        full = (time.perf_counter() - t0) / args.iters

        # augment only
        @jax.jit
        def aug_only(key):
            ks = jax.random.split(key, args.iters)
            def body(c, k):
                images = normalize_images(batch["image"])
                audios = normalize_audio(batch["audio"])
                gi, ga, li, la = augment(images[..., 0], audios[..., 0], k)
                return c, (gi.sum() + ga.sum() + li.sum() + la.sum())
            return jax.lax.scan(body, 0, ks)

        _, s = aug_only(jax.random.key(1)); _ = float(s[-1])
        t0 = time.perf_counter()
        _, s = aug_only(jax.random.key(2)); _ = float(s[-1])
        aug = (time.perf_counter() - t0) / args.iters

        # student fwd+bwd on pre-made folded views
        images = normalize_images(batch["image"])
        audios = normalize_audio(batch["audio"])
        gi, ga, li, la = jax.jit(augment)(images[..., 0], audios[..., 0],
                                          jax.random.key(3))
        def fold(v):
            b, n = v.shape[:2]
            return v.swapaxes(0, 1).reshape(n * b, *v.shape[2:])
        s_imgs = jnp.concatenate([fold(gi), fold(li)])
        s_auds = jnp.concatenate([fold(ga), fold(la)])
        cdt = cfg.compute_dtype

        @jax.jit
        def fwd_bwd(params, key):
            ks = jax.random.split(key, args.iters)
            def body(c, k):
                def loss_fn(p):
                    vs = {"params": jax.tree.map(
                        lambda x: x.astype(cdt) if jnp.issubdtype(x.dtype, jnp.floating) else x, p),
                        "batch_stats": jax.tree.map(
                        lambda x: x.astype(cdt) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                        state.batch_stats)}
                    (projs, feats), _ = student.apply(
                        vs, s_imgs.astype(cdt), s_auds.astype(cdt), train=True,
                        rngs={"dropout": k}, mutable=["batch_stats"])
                    return (projs.astype(jnp.float32) ** 2).mean()
                l, g = jax.value_and_grad(loss_fn)(params)
                return c, l
            return jax.lax.scan(body, 0, ks)

        _, l = fwd_bwd(state.params, jax.random.key(1)); _ = float(l[-1])
        t0 = time.perf_counter()
        _, l = fwd_bwd(state.params, jax.random.key(2)); _ = float(l[-1])
        sfb = (time.perf_counter() - t0) / args.iters

        # teacher forward only (2 global views)
        t_imgs, t_auds = fold(gi), fold(ga)

        @jax.jit
        def teacher_fwd(tp, key):
            ks = jax.random.split(key, args.iters)
            def body(c, k):
                vs = {"params": jax.tree.map(
                    lambda x: x.astype(cdt) if jnp.issubdtype(x.dtype, jnp.floating) else x, tp),
                    "batch_stats": jax.tree.map(
                    lambda x: x.astype(cdt) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                    state.teacher_batch_stats)}
                (projs, _), _ = obj.meta["student"].apply(
                    vs, t_imgs.astype(cdt), t_auds.astype(cdt), train=True,
                    rngs={"dropout": k}, mutable=["batch_stats"])
                return c, (projs.astype(jnp.float32) ** 2).mean()
            return jax.lax.scan(body, 0, ks)

        tparams = {k: state.params[k] for k in ("encoder", "projection")}
        _, l = teacher_fwd(tparams, jax.random.key(1)); _ = float(l[-1])
        t0 = time.perf_counter()
        _, l = teacher_fwd(tparams, jax.random.key(2)); _ = float(l[-1])
        tf = (time.perf_counter() - t0) / args.iters

        print(json.dumps({"model": args.model, "batch": bs,
                          "full_ms": round(full * 1e3, 2),
                          "augment_ms": round(aug * 1e3, 2),
                          "student_fwd_bwd_ms": round(sfb * 1e3, 2),
                          "teacher_fwd_ms": round(tf * 1e3, 2),
                          "pairs_per_sec": round(bs / full, 1)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
