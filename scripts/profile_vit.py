"""ViT step-cost microbench (dual-ViT throughput attack, VERDICT r2 #1/#4).

Times jitted fwd+bwd of the image/audio ViT encoders on the ambient backend at
the dual-ViT training shapes (folded student batch = (Ng+Nl)*B), isolating:
  - dropout on (train rate) vs off  -> RNG/mask generation cost
  - full encoder vs attention-only  -> where the FLOPs actually go

    PYTHONPATH=. python scripts/profile_vit.py --batch 768 --embed 128
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")


def bench(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])  # force through the relay
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=768)
    ap.add_argument("--embed", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from avmnist_tpu.models.vit import SelfAttention, ViTEncoder
    from avmnist_tpu.objectives.common import cast_tree

    shapes = {"image_vit": ((args.batch, 28, 28, 1), 4),
              "audio_vit": ((args.batch, 112, 112, 1), 8)}
    heads = max(1, args.embed // 64)

    for name, (shape, patch) in shapes.items():
        for drop in (0.3, 0.0):
            m = ViTEncoder(patch_size=patch, embed_dim=args.embed, depth=4,
                           num_heads=heads, dropout=drop)
            v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                       jnp.zeros((2,) + shape[1:]), train=False)
            p16 = cast_tree(v["params"], jnp.bfloat16)
            x = jnp.asarray(np.random.RandomState(0).rand(*shape), jnp.bfloat16)

            @jax.jit
            def fwd_bwd(p, key):
                def body(c, k):
                    def loss(pp):
                        o = m.apply({"params": pp}, x, train=True,
                                    rngs={"dropout": k})
                        return (o.astype(jnp.float32) ** 2).mean()
                    l, g = jax.value_and_grad(loss)(p)
                    return c, l
                return jax.lax.scan(body, 0.0, jax.random.split(key, args.iters))

            dt = bench(lambda: fwd_bwd(p16, jax.random.key(2)), iters=args.iters)
            print(json.dumps({"bench": name, "dropout": drop, "batch": args.batch,
                              "fwd_bwd_ms": round(dt * 1e3, 2)}), flush=True)

    # attention layer alone at the audio shape (197 tokens)
    for t in (197, 50):
        att = SelfAttention(num_heads=heads, dropout=0.0)
        v = att.init({"params": jax.random.key(0)},
                     jnp.zeros((2, t, args.embed)), train=False)
        p16 = cast_tree(v["params"], jnp.bfloat16)
        x = jnp.asarray(np.random.RandomState(0).rand(args.batch, t, args.embed),
                        jnp.bfloat16)

        @jax.jit
        def attn_fwd_bwd(p):
            def body(c, _):
                def loss(pp):
                    o = att.apply({"params": pp}, x, train=False)
                    return (o.astype(jnp.float32) ** 2).mean()
                l, g = jax.value_and_grad(loss)(p)
                return c, l
            return jax.lax.scan(body, 0.0, jnp.arange(args.iters))

        dt = bench(lambda: attn_fwd_bwd(p16), iters=args.iters)
        print(json.dumps({"bench": f"attention_T{t}", "batch": args.batch,
                          "fwd_bwd_ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
