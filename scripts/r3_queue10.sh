#!/bin/bash
# Round-3/4 queue, leg 10 (waits for leg 9's chip): two remaining validation runs.
#
#   A. Augmentation hyperparameter search IN ANGER (--hyperparameter_tune_augments):
#      the reference's second Optuna phase (run_dino.py:41-123, TPE with the
#      p_local >= p_global constraint, best_augments write-back). The round-3
#      study exercised the plain hyperparameter phase; this leg exercises the
#      augment phase at the same scale (12 trials x 20 epochs on multi_central,
#      then the final 100-epoch experiment under the tuned augment bank).
#   B. multi_central 100 ep x 3 seeds under the round-3 reference-exact
#      defaults (10-retry RRC sampler default-on, commit db8ec77) — upgrades
#      the n=1 recheck row in PARITY.md to a protocol 3-seed row.
#
# One chip: strictly sequential. Waits for r3_queue9 via its pid file (which
# queue9 now actually writes — ADVICE r3) AND, belt-and-braces, on queue9's
# durable done-markers, so a parallel relaunch cannot double-book the chip.
# Durability: git only (see r3_queue9.sh header) — artifacts are committed via
# scripts/queue_commit.sh as each job drains.
set -u
cd /root/repo
MARKERS=runs/.queue_markers; mkdir -p "$MARKERS"

Q=/tmp/r3j_queue.log
log() { echo "[queue10 $(date +%H:%M:%S)] $*" >> "$Q"; }

queue9_active() {
  # pid file written by a live r3_queue9.sh in THIS boot (checked against
  # /proc cmdline so a recycled pid can't wedge us)...
  if [ -f /tmp/r3i_queue.pid ]; then
    local p; p=$(cat /tmp/r3i_queue.pid)
    if grep -qa r3_queue9 "/proc/$p/cmdline" 2>/dev/null; then return 0; fi
  fi
  return 1
}
queue9_done() { # belt-and-braces: queue9's committed done-markers (survive reboot)
  [ -f "$MARKERS/r3i_done_dualvit_diag_canonical_s3" ] && \
  [ -f "$MARKERS/r3i_done_dualvit_canonical_100ep" ]
}
# Startup grace closes the relaunch race: both queues are started together at
# session start, and if this check ran before queue9 wrote its pid file we
# would double-book the chip.
queue9_done || sleep 90
while queue9_active && ! queue9_done; do sleep 60; done
log "queue9 drained (markers done, or pid gone/never started)"

run_job() { # name stale_s cmd... (watchdog pins AVMNIST_RUN_NAME=$name and
  # sets AVMNIST_RESUME_LAST, so a rebooted session continues the same run dir)
  local name=$1 stale=$2; shift 2
  local marker=$MARKERS/r3j_done_$name
  if [ -f "$marker" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  scripts/run_with_stall_watchdog.sh "$name" "runs/parity/scratch/$name" "$stale" -- "$@"
  local rc=$?
  log "end $name rc=$rc"
  if [ $rc -eq 0 ]; then
    touch "$marker"
    rm -rf "runs/parity/scratch/$name"/ckpt_seed*/last
    local data_dirs=""
    for d in "runs/parity/data/$name" runs/parity/data/${name%_r3}_*; do
      [ -e "$d" ] && data_dirs="$data_dirs $d"
    done
    scripts/queue_commit.sh "Queue: $name complete (artifacts + done-marker)" \
      "$marker" "runs/parity/scratch/$name" $data_dirs >> "$Q" 2>&1
  fi
  return $rc
}

run_job multi_central_tuneaug_r3 2700 \
  timeout 10800 python -u run_dino.py --model multi_central \
    --config configs/config_parity_synth_tune.yaml \
    --metric mlp_acc --training_mode default \
    --hyperparameter_tune_augments --seeds 1

run_job multi_central_refexact_3seed_r3 1500 \
  timeout 10800 python -u run_dino.py --model multi_central \
    --config configs/config_parity_synth.yaml \
    --metric mlp_acc --training_mode default --seeds 1 2 3 --epochs 100

log "queue10 complete"
