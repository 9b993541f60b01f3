"""Measure the multi-chip collective profile of the production DINO step
(VERDICT r3 #5: put an ARTIFACT behind the v5e-8 projection instead of assumed
arithmetic).

Compiles the PRODUCTION-config DINO multi_central training step over an
8-device (data, model) mesh (virtual CPU devices — collective structure is a
property of the SPMD partitioning, not of the backend) and extracts every
collective operation from the optimized HLO: op kind, element type, byte
count. Only the gradient/BN/center all-reduce payload is batch-size
independent (parameter-sized); any augment-boundary resharding collectives
(all-gather/all-to-all/permute on view-shaped tensors) scale with per-device
batch, so bench.py scales those kinds by bench_batch/profiled_batch when
projecting (see _v5e8_projection's `batch_prop` set).

Writes docs/collective_profile.json, which bench.py reads to report
`vs_baseline_v5e8_projected` for the DINO row from a MEASURED collective
payload + documented ICI assumptions (scaling-book ring all-reduce model).

Usage:  python scripts/collective_profile.py  (re-runs the measurement)
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


def _measure_impl(global_batch: int = 128):
    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from avmnist_tpu.data.synthetic import make_synthetic_avmnist
    from avmnist_tpu.objectives.dino import DinoConfig, make_dino_objective
    from avmnist_tpu.parallel import create_mesh, replicate_state, shard_batch

    n = 8
    mesh = create_mesh(n_data=n, n_model=1, devices=jax.devices()[:n])
    # PRODUCTION config (bench.py's DINO row). The GRADIENT all-reduce payload
    # is parameter-sized (batch-independent), but the augment-boundary
    # resharding collectives scale with per-device batch (advisor r4 #5), so
    # the profile must be taken at a realistic per-device batch; bench.py
    # rescales the batch-proportional kinds to its own bench batch.
    cfg = DinoConfig(model_name="multi_central")
    obj = make_dino_objective(cfg, mesh=mesh)
    state = replicate_state(obj.init_fn(jax.random.key(0)), mesh)
    train, _ = make_synthetic_avmnist(n_train=global_batch, n_test=8, seed=0)
    batch = shard_batch(train.gather(np.arange(global_batch)), mesh)

    step = obj.step_fn
    lowered = step.lower(state, batch, jax.random.key(1)) \
        if hasattr(step, "lower") else jax.jit(step).lower(
            state, batch, jax.random.key(1))
    compiled = lowered.compile()
    hlo = compiled.as_text()
    ops = collect(hlo)

    params_bytes = sum(np.asarray(x).nbytes
                       for x in jax.tree.leaves(jax.device_get(state.params)))
    total = sum(o["bytes"] for o in ops)
    by_kind = {}
    for o in ops:
        by_kind[o["op"]] = by_kind.get(o["op"], 0) + o["bytes"]

    result = {
        "program": "DINO multi_central production step_fn, 8-device data mesh",
        "n_devices": n,
        "global_batch": int(global_batch),
        "params_bytes": int(params_bytes),
        "collective_ops": len(ops),
        "collective_bytes_total": int(total),
        "collective_bytes_by_kind": by_kind,
        "ops": sorted(ops, key=lambda o: -o["bytes"])[:40],
        "model": ("ring all-reduce cost = 2*(N-1)/N * bytes / ici_bw per op "
                  "(scaling-book); ICI assumptions live in bench.py; "
                  "batch-proportional share scales as bench_batch/global_batch"),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "ops"}, indent=1))


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
    gb = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    code = ("import sys; sys.path.insert(0, %r); "
            "from scripts.collective_profile import _measure_impl; "
            "_measure_impl(%d)" % (REPO, gb))
    subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env, check=True)


if __name__ == "__main__":
    main()
