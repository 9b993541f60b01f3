#!/usr/bin/env bash
# Deviation ablations (docs/DEVIATIONS.md; VERDICT round-1 item 10): re-run the
# DINO multi_central parity protocol (1 seed x 100 epochs) with each documented
# numerics deviation toggled to its reference-exact variant, so the 0.5 %
# accuracy-parity budget is allocated by measurement. Results land in
# runs/parity/{data,scratch}/ and are summarized in docs/DEVIATIONS.md.
set -euo pipefail
cd "$(dirname "$0")/.."

run_dino() {
  local tag="$1"; shift
  echo "=== ablation: $tag ($(date +%H:%M:%S)) ==="
  timeout 3600 python -u run_dino.py --model multi_central --metric mlp_acc \
      --seeds 1 "$@" 2>&1 | grep -v WARNING | tail -3
}

run_dino baseline       --config configs/config_parity_synth.yaml
run_dino probe_bn_eval  --config configs/config_parity_synth_probe_eval.yaml
AVMNIST_NEAREST_WARP=1 run_dino nearest_warp --config configs/config_parity_synth.yaml
AVMNIST_RRC_RETRY=1    run_dino rrc_retry    --config configs/config_parity_synth.yaml
AVMNIST_NEAREST_WARP=1 AVMNIST_RRC_RETRY=1 \
  run_dino joint        --config configs/config_parity_synth.yaml

echo "=== ablation: simclr torch-adam-branches ($(date +%H:%M:%S)) ==="
AVMNIST_TORCH_ADAM_BRANCHES=1 timeout 3600 python -u -m avmnist_tpu.cli.run_ssl \
    --workload multimodal_simclr --config configs/config_parity_ssl_ablate.yaml \
    --seeds 1 2>&1 | grep -v WARNING | tail -3
