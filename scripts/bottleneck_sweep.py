"""Name the binding resource for the vmem-excess bench rows (VERDICT r4 #4).

For each selected workload, times the bench scan at several batch sizes and
fits  step_time(b) = fixed + marginal * b  by least squares. The split says
what binds at the bench batch:

- fixed >> marginal*b  -> per-step fixed overhead (dispatch + small-op launch
  latency + unbatched epilogue ops) — the relay cost model's 2.4 ms/dispatch
  + 0.5 ms/pallas-call territory (docs/PERF_NOTES.md);
- marginal*b >> fixed with hbm_roofline ~100 -> a true HBM wall;
- marginal*b >> fixed with vmem_excess > 1 -> VMEM-fed working set: the
  byte-model traffic never leaves VMEM, so the binding resource is VPU/issue
  throughput on small hot buffers, not HBM.

Also reports the best-rate batch so a row capped by a too-small bench batch
(mobilevit ran at 512) is visible immediately.

    python scripts/bottleneck_sweep.py [--only mobilevit multimodal masked]
    (run on the TPU; one chip, sequential, ~1-2 min per workload+batch)
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="+", default=None,
                    help="substring filters on the bench metric name")
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[128, 256, 512, 1024, 2048])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import bench
    from avmnist_tpu.data.synthetic import make_synthetic_avmnist

    max_b = max(args.batches)
    train, _ = make_synthetic_avmnist(n_train=max_b, n_test=8, seed=0)

    for metric, unit, bench_bs, baseline, build in bench.workloads():
        if args.only and not any(s in metric for s in args.only):
            continue
        rows = {}
        for bs in args.batches:
            try:
                batch = train.gather(np.arange(bs) % max_b)
                rate, achieved, mfu, apparent_bw, step_time = bench.measure(
                    build(), batch, bs, n_steps=args.iters)
                rows[bs] = {"step_ms": round(step_time * 1e3, 3),
                            "rate": round(rate, 1),
                            "hbm_pct_raw": (round(100 * apparent_bw
                                                  / bench.PEAK_HBM, 1)
                                            if apparent_bw else None)}
            except Exception as e:
                rows[bs] = {"error": f"{type(e).__name__}: {e}"}
                break
        ok = {b: r for b, r in rows.items() if "step_ms" in r}
        rec = {"metric": metric, "bench_batch": bench_bs, "sweep": rows}
        if len(ok) >= 2:
            bs_arr = np.array(sorted(ok))
            t_arr = np.array([ok[b]["step_ms"] for b in bs_arr])
            slope, intercept = np.polyfit(bs_arr, t_arr, 1)
            best = max(ok, key=lambda b: ok[b]["rate"])
            t_bench = ok.get(bench_bs, ok[max(ok)])["step_ms"]
            rec.update({
                "fixed_ms_per_step": round(float(intercept), 3),
                "marginal_ms_per_sample": round(float(slope), 5),
                "fixed_share_at_bench_batch": round(
                    float(intercept) / t_bench, 3),
                "best_batch": int(best),
                "best_rate": ok[best]["rate"],
                "best_vs_baseline": round(ok[best]["rate"] / baseline, 2),
            })
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
