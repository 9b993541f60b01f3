#!/bin/bash
# Round-3 follow-on TPU queue: waits for r3_queue.sh to drain, then
# 1. profiles the DINO step decomposition (multi_central + dual_vit) — VERDICT r2 #4
# 2. runs the multi_dual_vit seed-1 protocol leg under the round-3 AMP-autocast
#    precision policy (f32 LN/softmax; commit 80eddd9) — VERDICT r2 #1
# Idempotent via done-markers, bounded by timeout. Logs: /tmp/r3b_*.log.
set -u
cd /root/repo

Q=/tmp/r3_queue2.log
log() { echo "[queue2 $(date +%H:%M:%S)] $*" >> "$Q"; }

if [ -f /tmp/r3_queue.pid ]; then
  log "waiting on r3_queue pid $(cat /tmp/r3_queue.pid)"
  while kill -0 "$(cat /tmp/r3_queue.pid)" 2>/dev/null; do sleep 30; done
fi

run_job() { # name bound_s cmd...
  local name=$1 bound=$2; shift 2
  local marker=/tmp/r3b_done_$name
  if [ -f "$marker" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  timeout "$bound" "$@" > "/tmp/r3b_${name}.log" 2>&1
  local rc=$?
  log "end $name rc=$rc"
  [ $rc -eq 0 ] && touch "$marker"
  return $rc
}

run_job profile_central 1800 \
  env PYTHONPATH=/root/repo python scripts/profile_dino.py --model multi_central --batch 256 512 1024

run_job profile_dualvit 2400 \
  env PYTHONPATH=/root/repo python scripts/profile_dino.py --model multi_dual_vit --batch 128 256

# dual_vit seed 1, full 100-epoch protocol, bf16 with the f32-LN/softmax policy
run_job dualvit_fixed_s1 12600 \
  env AVMNIST_MAX_SCAN_STEPS=64 \
  python run_dino.py --model multi_dual_vit --config configs/config_parity_synth.yaml \
    --metric mlp_acc --training_mode default --seeds 1

log "queue2 complete"
