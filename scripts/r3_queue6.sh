#!/bin/bash
# Round-3 queue, leg 6: the definitive dual-ViT experiment.
# Runs the three 100-epoch full-data protocol seeds sequentially under the
# round-3 f32-LN/softmax policy (commit 80eddd9). Idempotent via done-markers.
# Logs: /tmp/r3f_dualvit_s{1,2,3}.log; progress: /tmp/r3f_queue.log.
set -u
cd /root/repo

Q=/tmp/r3f_queue.log
log() { echo "[queue6 $(date +%H:%M:%S)] $*" >> "$Q"; }

run_job() { # name bound_s cmd...
  local name=$1 bound=$2; shift 2
  local marker=/tmp/r3f_done_$name
  if [ -f "$marker" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  timeout "$bound" "$@" > "/tmp/r3f_${name}.log" 2>&1
  local rc=$?
  log "end $name rc=$rc"
  [ $rc -eq 0 ] && touch "$marker"
  return $rc
}

for s in 1 2 3; do
  run_job "dualvit_s${s}" 14400 \
    env AVMNIST_MAX_SCAN_STEPS=64 \
    python -u run_dino.py --model multi_dual_vit --config configs/config_parity_synth.yaml \
      --metric mlp_acc --training_mode default --seeds "$s"
done

log "queue6 complete"
