"""Measure the multi-chip collective profile of every production bench
workload (VERDICT r3 #5 / r4 #2: put an ARTIFACT behind each v5e-8 projection
instead of assumed arithmetic).

Compiles each PRODUCTION-config training step from bench.workloads() over an
8-device (data, model) mesh (virtual CPU devices — collective structure is a
property of the SPMD partitioning, not of the backend) and extracts every
collective operation from the optimized HLO: op kind, element type, byte
count. Only the gradient/BN/center all-reduce payload is batch-size
independent (parameter-sized); batch-shaped collectives — e.g. the
contrastive-negatives all-gather of projection rows for the global NT-Xent /
InfoNCE similarity matrix — scale with per-device batch, so bench.py scales
those kinds by bench_batch/profiled_batch when projecting (see
_v5e8_projection's `batch_prop` set).

Writes docs/collective_profile.json keyed by bench metric name; bench.py
reads it to report `vs_baseline_v5e8_projected` + `collective_overhead_pct`
on every row from a MEASURED collective payload + documented ICI assumptions
(scaling-book ring all-reduce model).

Caveat: the profile compiles the CPU lowering, where the pallas NT-Xent
kernel is off — the XLA NT-Xent path all-gathers the same (2B, P) projection
rows the TPU pallas path needs, so the collective structure matches.

Usage:  python scripts/collective_profile.py [global_batch] [workload ...]
        (default: batch 128, all workloads; partial runs merge into the file)
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "collective_profile.json")

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}

# one tuple shape: bf16[1,2,3]{...}; scalar: f32[]
_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)"
                       r"\[([0-9,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collect(hlo_text: str):
    """Sum collective payloads in optimized HLO. Counts each op's OUTPUT shape
    (for all-reduce the payload; for all-gather the gathered result)."""
    ops = []
    # lines look like:  %all-reduce.5 = (f32[16,128]{...}) all-reduce(...)
    for line in hlo_text.splitlines():
        # NB: tuple shapes embed /*index=N*/ comments — the char class must
        # include '*' or long gradient-bundle all-reduces get truncated.
        m = re.search(r"=\s*(\(?[a-z0-9\[\],{}: /#*=\"._-]+\)?)\s*"
                      r"(all-reduce|all-gather|reduce-scatter|"
                      r"collective-permute|all-to-all)(?:-start)?\(", line)
        if not m:
            continue
        shape_str, kind = m.group(1), m.group(2)
        # async pairs lower as X-start/X-done; -done re-states the shape, so
        # only -start (or the sync form) is counted
        if re.search(r"(all-reduce|all-gather|reduce-scatter|"
                      r"collective-permute|all-to-all)-done\(", line):
            continue
        ops.append({"op": kind, "bytes": _shape_bytes(shape_str),
                    "shape": shape_str.strip()[:120]})
    return ops


def _profile_one(build, global_batch: int, mesh, train):
    import jax
    import numpy as np

    from avmnist_tpu.parallel import replicate_state, shard_batch

    obj = build(mesh=mesh)
    state = replicate_state(obj.init_fn(jax.random.key(0)), mesh)
    batch = shard_batch(train.gather(np.arange(global_batch)), mesh)
    step = obj.step_fn
    lowered = step.lower(state, batch, jax.random.key(1)) \
        if hasattr(step, "lower") else jax.jit(step).lower(
            state, batch, jax.random.key(1))
    compiled = lowered.compile()
    ops = collect(compiled.as_text())

    params_bytes = sum(np.asarray(x).nbytes
                       for x in jax.tree.leaves(jax.device_get(state.params)))
    by_kind = {}
    for o in ops:
        by_kind[o["op"]] = by_kind.get(o["op"], 0) + o["bytes"]
    return {
        "global_batch": int(global_batch),
        "params_bytes": int(params_bytes),
        "collective_ops": len(ops),
        "collective_bytes_total": int(sum(o["bytes"] for o in ops)),
        "collective_bytes_by_kind": by_kind,
        "ops": sorted(ops, key=lambda o: -o["bytes"])[:12],
    }


def _measure_impl(global_batch: int = 128, only=()):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import bench
    from avmnist_tpu.data.synthetic import make_synthetic_avmnist
    from avmnist_tpu.parallel import create_mesh

    n = 8
    mesh = create_mesh(n_data=n, n_model=1, devices=jax.devices()[:n])
    train, _ = make_synthetic_avmnist(n_train=max(global_batch, 16), n_test=8,
                                      seed=0)
    doc = {"n_devices": n, "workloads": {},
           "model": ("ring all-reduce cost = 2*(N-1)/N * bytes / ici_bw per "
                     "op (scaling-book); ICI assumptions live in bench.py; "
                     "batch-shaped kinds (all-gather/all-to-all/permute) "
                     "scale as bench_batch/global_batch")}
    if os.path.exists(OUT):  # merge partial runs
        try:
            with open(OUT) as f:
                old = json.load(f)
            if old.get("n_devices") == n and "workloads" in old:
                doc["workloads"].update(old["workloads"])
        except Exception:
            pass
    for metric, unit, bs, baseline, build in bench.workloads():
        if only and not any(s in metric for s in only):
            continue
        print(f"[collective_profile] compiling {metric} "
              f"@ global batch {global_batch} over {n} devices", flush=True)
        try:
            doc["workloads"][metric] = _profile_one(build, global_batch, mesh,
                                                    train)
        except Exception as e:
            print(f"[collective_profile] {metric} FAILED: "
                  f"{type(e).__name__}: {e}", flush=True)
            continue
        with open(OUT, "w") as f:
            json.dump(doc, f, indent=1)
    summary = {m: {k: v for k, v in p.items() if k != "ops"}
               for m, p in doc["workloads"].items()}
    print(json.dumps(summary, indent=1))


def main():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    sys.path.insert(0, REPO)
    import __graft_entry__

    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   __graft_entry__._host_keyed_cache_dir())
    args = sys.argv[1:]
    gb = int(args[0]) if args and args[0].isdigit() else 128
    only = tuple(a for a in args if not a.isdigit())
    code = ("import sys; sys.path.insert(0, %r); "
            "from scripts.collective_profile import _measure_impl; "
            "_measure_impl(%d, %r)" % (REPO, gb, only))
    subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env, check=True)


if __name__ == "__main__":
    main()
