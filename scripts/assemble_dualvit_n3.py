"""Assemble the dual-ViT canonical 100-epoch n=3 protocol row (VERDICT r4 #5)
from the r4 seed-1 artifact + the r5 seeds-2/3 run, directly from per-sample
downstream test logs (the ground truth the summaries are computed from).

    python scripts/assemble_dualvit_n3.py
prints per-seed downstream MLP/kNN accuracy and the combined mean +/- std.
"""
from __future__ import annotations

import csv
import glob
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _acc_from_log(path: str) -> float:
    with open(path) as f:
        rows = list(csv.DictReader(f))
    true = np.array([int(float(r["true_label"])) for r in rows])
    pred = np.array([int(float(r["predicted_label"])) for r in rows])
    return float(100.0 * np.mean(true == pred))


def main():
    specs = [
        ("seed1 (r4 run)", "runs/parity/scratch/dualvit_canonical_100ep/"
         "downstream/dualvit_canonical_100ep_seed1_test_log.csv"),
        ("seed2 (r5 run)", "runs/parity/scratch/dualvit_canonical_s23_r5/"
         "downstream/dualvit_canonical_s23_r5_seed2_test_log.csv"),
        ("seed3 (r5 run)", "runs/parity/scratch/dualvit_canonical_s23_r5/"
         "downstream/dualvit_canonical_s23_r5_seed3_test_log.csv"),
    ]
    mlps = {}
    for name, rel in specs:
        path = os.path.join(REPO, rel)
        if not os.path.exists(path):
            hits = glob.glob(path.replace("_seed", "*seed"))
            path = hits[0] if hits else path
        if os.path.exists(path):
            mlps[name] = _acc_from_log(path)
            print(f"{name}: downstream MLP {mlps[name]:.2f}  ({path})")
        else:
            print(f"{name}: MISSING ({path})")
    # kNN comes from each run dir's summary (knn is computed in-run, not
    # re-derivable from the MLP test log)
    for d in ("runs/parity/data/dualvit_canonical_100ep",
              "runs/parity/data/dualvit_canonical_s23_r5"):
        p = os.path.join(REPO, d, "performance_summary.txt")
        if os.path.exists(p):
            with open(p) as f:
                head = [next(f) for _ in range(5)]
            print(f"--- {d}:")
            print("".join(head).rstrip())
    if len(mlps) == 3:
        v = np.array(list(mlps.values()))
        print(f"\nCombined n=3 downstream MLP: {v.mean():.2f} +/- {v.std(ddof=1):.2f}")


if __name__ == "__main__":
    main()
