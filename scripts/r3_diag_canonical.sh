#!/bin/bash
# Dual-ViT rescue diagnostic E: canonical DINO collapse protection —
# teacher_temperature 0.07 + lr_warmup_epochs 10 (both opt-in deviations,
# docs/DEVIATIONS.md) on the otherwise-unchanged parity config. 30 epochs.
# If this learns (probe well above chance), the framework demonstrably trains
# the dual-ViT architecture and the faithful-recipe collapse is the reference
# recipe's own dynamics on this corpus.
set -u
cd /root/repo
timeout 5400 env AVMNIST_MAX_SCAN_STEPS=64 AVMNIST_RUN_NAME=dualvit_diag_canonical \
  python -u run_dino.py --model multi_dual_vit --config /tmp/diag_canonical.yaml \
    --metric mlp_acc --training_mode default --seeds 1 --epochs 30 \
    > /tmp/r3h_diag_canonical.log 2>&1
echo "rc=$?" >> /tmp/r3h_diag_canonical.log
