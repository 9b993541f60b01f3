#!/bin/bash
# Round-3 queue, leg 3 (relaunched after session restart killed leg 1/2 jobs).
# Serialized single-chip jobs, priority order:
#   1. DINO step-cost profile (feeds the throughput work, VERDICT r2 #4)
#   2. tune-study resume to completion (VERDICT r2 #3; the session death that
#      killed the previous leg mid-study IS the kill/resume evidence)
#   3. multi_dual_vit 100-epoch protocol seeds 1-3 under the round-3
#      f32-LN/softmax precision policy (VERDICT r2 #1)
# Idempotent via done-markers. Logs: /tmp/r3c_*.log.
set -u
cd /root/repo

Q=/tmp/r3c_queue.log
log() { echo "[queue3 $(date +%H:%M:%S)] $*" >> "$Q"; }

run_job() { # name bound_s cmd...
  local name=$1 bound=$2; shift 2
  local marker=/tmp/r3c_done_$name
  if [ -f "$marker" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  timeout "$bound" "$@" > "/tmp/r3c_${name}.log" 2>&1
  local rc=$?
  log "end $name rc=$rc"
  [ $rc -eq 0 ] && touch "$marker"
  return $rc
}

run_job profile_central 2400 \
  env PYTHONPATH=/root/repo python -u scripts/profile_dino.py \
    --model multi_central --batch 256 512 1024 2048

run_job tune_resume 7200 \
  env AVMNIST_RUN_NAME=multi_central_tune_mlp_acc_r3 \
  python -u run_dino.py --model multi_central \
    --config configs/config_parity_synth_tune.yaml --metric mlp_acc \
    --training_mode default --hyperparameter_tune --seeds 1

for s in 1 2 3; do
  run_job "dualvit_s${s}" 16200 \
    env AVMNIST_MAX_SCAN_STEPS=64 \
    python -u run_dino.py --model multi_dual_vit --config configs/config_parity_synth.yaml \
      --metric mlp_acc --training_mode default --seeds "$s"
done

run_job profile_dualvit 2400 \
  env PYTHONPATH=/root/repo python -u scripts/profile_dino.py \
    --model multi_dual_vit --batch 128 256

log "queue3 complete"
