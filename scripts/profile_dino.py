"""Decompose the DINO step cost (VERDICT r2 #4: 3.58x -> target >=8x per chip).

Measures on the ambient backend, one JSON line per batch size:
  - full step (augment + student fwd/bwd + teacher + EMA + Adam), lax.scan of
    --iters steps to amortize dispatch (like bench.py)
  - noaug step: the identical step with the identity-augment profiling hook
    (DinoConfig.identity_augment): network+loss+optimizer cost; full - noaug
    isolates the in-situ augmentation cost
  - per-bank augmentation timing (image/audio x global/local), hoist-proof
    (each scan iteration consumes a fresh PRNG key)
  - with --detail: cumulative per-op prefix timing of the audio banks

All jitted functions take the batch as an ARGUMENT (a closed-over batch becomes
an HLO constant, which blows past the compile-relay's HTTP payload limit at
batch >= 1024).

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


def scan_time(fn, *args, iters):
    """Wall time per iteration of an already-jitted scan program."""
    out = fn(*args)  # compile + warm
    _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="multi_central")
    ap.add_argument("--batch", type=int, nargs="+", default=[256])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--detail", action="store_true",
                    help="per-op prefix timing of the audio augment banks")
    args = ap.parse_args()

    from avmnist_tpu.augment.multicrop import apply_chain
    from avmnist_tpu.data.synthetic import make_synthetic_avmnist
    from avmnist_tpu.objectives.common import normalize_audio, normalize_images
    from avmnist_tpu.objectives.dino import DinoConfig, make_dino_objective

    train, _ = make_synthetic_avmnist(n_train=2048, n_test=8, seed=0)
    iters = args.iters

    for bs in args.batch:
        cfg = DinoConfig(model_name=args.model)
        obj = make_dino_objective(cfg)
        noaug_obj = make_dino_objective(
            DinoConfig(model_name=args.model, identity_augment=True))
        batch = {k: jax.device_put(v)
                 for k, v in train.gather(np.arange(bs) % 2048).items()}
        state = obj.init_fn(jax.random.key(0))
        augment = obj.meta["augment"]

        def make_runner(o):
            @jax.jit
            def run_steps(state, batch, key):
                def body(s, k):
                    s, m = o.step_fn(s, batch, k)
                    return s, m["train_loss"]
                return jax.lax.scan(body, state, jax.random.split(key, iters))
            return run_steps

        full = scan_time(make_runner(obj), state, batch, jax.random.key(1),
                         iters=iters)
        noaug = scan_time(make_runner(noaug_obj), state, batch,
                          jax.random.key(1), iters=iters)
        # remat A/B (round 5): student-forward rematerialization trades HBM
        # activation traffic for MXU recompute — the candidate lever for the
        # 60 % -> 100 % roofline gap.
        remat_obj = make_dino_objective(
            DinoConfig(model_name=args.model, remat_student=True))
        remat = scan_time(make_runner(remat_obj), state, batch,
                          jax.random.key(1), iters=iters)

        # per-bank augmentation cost (keys differ per iteration -> no hoisting)
        images = jax.device_put(np.asarray(
            normalize_images(batch["image"])[..., 0]))
        audios = jax.device_put(np.asarray(
            normalize_audio(batch["audio"])[..., 0]))

        def bank_timer(ops, n_views):
            ops = tuple(ops)

            @jax.jit
            def run(x, key):
                tiled = jnp.tile(x, (n_views, 1, 1))
                def body(c, k):
                    out = apply_chain(ops, tiled, k)
                    return c, out.reshape(-1)[0]
                return jax.lax.scan(body, 0.0, jax.random.split(key, iters))
            return run

        banks = {}
        for name, ops, x, n in (
                ("image_global", augment.image_global, images, cfg.n_global_views),
                ("audio_global", augment.audio_global, audios, cfg.n_global_views),
                ("image_local", augment.image_local, images, cfg.n_local_views),
                ("audio_local", augment.audio_local, audios, cfg.n_local_views)):
            banks[name] = round(scan_time(bank_timer(ops, n), x,
                                          jax.random.key(2), iters=iters) * 1e3, 2)

        rec = {"model": args.model, "batch": bs,
               "full_ms": round(full * 1e3, 2),
               "noaug_ms": round(noaug * 1e3, 2),
               "remat_ms": round(remat * 1e3, 2),
               "augment_in_situ_ms": round((full - noaug) * 1e3, 2),
               "banks_ms": banks,
               "pairs_per_sec": round(bs / full, 1),
               "pairs_per_sec_remat": round(bs / remat, 1)}
        print(json.dumps(rec), flush=True)

        if args.detail:
            for bank_name, ops, x, n in (
                    ("audio_global", augment.audio_global, audios,
                     cfg.n_global_views),
                    ("audio_local", augment.audio_local, audios,
                     cfg.n_local_views)):
                rows = []
                for k in range(1, len(ops) + 1):
                    t = scan_time(bank_timer(ops[:k], n), x, jax.random.key(3),
                                  iters=iters)
                    rows.append({"upto": ops[k - 1].kind,
                                 "cum_ms": round(t * 1e3, 2)})
                print(json.dumps({"detail": bank_name, "batch": bs,
                                  "prefix": rows}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
