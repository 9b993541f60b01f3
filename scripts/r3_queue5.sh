#!/bin/bash
# Round-3 queue, leg 5 (final). Takes over from the surviving leg-1 tune job:
#   0. wait for the in-flight tune study (pid file /tmp/r3e_tune.pid)
#   1. DINO step-cost profile, multi_central (VERDICT r2 #4) — with the axon
#      plugin path preserved on PYTHONPATH (leg-3 bug: PYTHONPATH=/root/repo
#      clobbered /root/.axon_site, which registers the TPU relay plugin)
#   2. DINO bench batch scan (larger per-chip batch, resident-scan input)
#   3. multi_dual_vit 100-epoch protocol seeds 1,2,3 under the round-3
#      f32-LN/softmax policy (VERDICT r2 #1)
#   4. dual_vit step profile, if wall-clock remains
# Idempotent via done-markers. Logs: /tmp/r3e_*.log.
set -u
cd /root/repo

Q=/tmp/r3e_queue.log
log() { echo "[queue5 $(date +%H:%M:%S)] $*" >> "$Q"; }

if [ -f /tmp/r3e_tune.pid ]; then
  log "waiting on tune pid $(cat /tmp/r3e_tune.pid)"
  while kill -0 "$(cat /tmp/r3e_tune.pid)" 2>/dev/null; do sleep 20; done
  log "tune done"
fi

run_job() { # name bound_s cmd...
  local name=$1 bound=$2; shift 2
  local marker=/tmp/r3e_done_$name
  if [ -f "$marker" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  timeout "$bound" "$@" > "/tmp/r3e_${name}.log" 2>&1
  local rc=$?
  log "end $name rc=$rc"
  [ $rc -eq 0 ] && touch "$marker"
  return $rc
}

run_job profile_central 2400 \
  env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_dino.py \
    --model multi_central --batch 256 512 1024 2048

# Gate: give the operator a window to run bench A/Bs on the free chip before
# committing it to ~10h of protocol seeds. Proceeds on marker or after 35 min.
GATE=/tmp/r3e_go_dualvit
log "gate: waiting for $GATE (failsafe 2100s)"
waited=0
while [ ! -f "$GATE" ] && [ $waited -lt 2100 ]; do sleep 15; waited=$((waited+15)); done
log "gate passed (marker=$([ -f $GATE ] && echo yes || echo timeout))"

for s in 1 2 3; do
  run_job "dualvit_s${s}" 16200 \
    env AVMNIST_MAX_SCAN_STEPS=64 \
    python -u run_dino.py --model multi_dual_vit --config configs/config_parity_synth.yaml \
      --metric mlp_acc --training_mode default --seeds "$s"
done

run_job profile_dualvit 2400 \
  env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_dino.py \
    --model multi_dual_vit --batch 128 256

log "queue5 complete"
