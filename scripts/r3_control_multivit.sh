#!/bin/bash
# Control run: multi_vit DINO (ViT image encoder + conv audio encoder,
# reference dino.py:273-287) under the UNCHANGED faithful parity config,
# 30 epochs. Purpose: isolate the dual-ViT collapse — if this ViT-encoder
# DINO trains above chance under the exact recipe that collapses dual-ViT,
# the fixed point is specific to the dual-ViT (audio-ViT + ungated-concat
# fusion) architecture x recipe x corpus, not to ViTs or DINO in this stack.
set -u
cd /root/repo
timeout 5400 env AVMNIST_MAX_SCAN_STEPS=64 AVMNIST_RUN_NAME=dualvit_control_multivit \
  python -u run_dino.py --model multi_vit --config configs/config_parity_synth.yaml \
    --metric mlp_acc --training_mode default --seeds 1 --epochs 30 \
    > /tmp/r3h_control_multivit.log 2>&1
echo "rc=$?" >> /tmp/r3h_control_multivit.log
