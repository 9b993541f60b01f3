#!/bin/bash
# Round-3 queue, leg 10 (waits for leg 9's chip): two remaining validation runs.
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
# One chip: strictly sequential, waits for r3_queue9 to drain first.
set -u
cd /root/repo
MARKERS=runs/.queue_markers; mkdir -p "$MARKERS"

# Drop any half-written rolling checkpoint (see r3_queue9.sh).
for d in runs/parity/scratch/*/ckpt_seed*/last; do
  [ -d "$d" ] && [ ! -f "$d/_CHECKPOINT_METADATA" ] && rm -rf "$d"
done

Q=/tmp/r3j_queue.log
log() { echo "[queue10 $(date +%H:%M:%S)] $*" >> "$Q"; }

if [ -f /tmp/r3i_queue.pid ]; then
  log "waiting on queue9 pid $(cat /tmp/r3i_queue.pid)"
  while kill -0 "$(cat /tmp/r3i_queue.pid)" 2>/dev/null; do sleep 60; done
  log "queue9 drained"
fi

run_job() { # name stale_s cmd... (watchdog pins AVMNIST_RUN_NAME=$name and
  # sets AVMNIST_RESUME_LAST, so a rebooted session continues the same run dir)
  local name=$1 stale=$2; shift 2
  local marker=$MARKERS/r3j_done_$name
  if [ -f "$marker" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  scripts/run_with_stall_watchdog.sh "$name" "runs/parity/scratch/$name" "$stale" -- "$@"
  local rc=$?
  log "end $name rc=$rc"
  [ $rc -eq 0 ] && touch "$marker"
  return $rc
}

run_job multi_central_tuneaug_r3 1500 \
  timeout 10800 python -u run_dino.py --model multi_central \
    --config configs/config_parity_synth_tune.yaml \
    --metric mlp_acc --training_mode default \
    --hyperparameter_tune_augments --seeds 1

run_job multi_central_refexact_3seed_r3 1500 \
  timeout 10800 python -u run_dino.py --model multi_central \
    --config configs/config_parity_synth.yaml \
    --metric mlp_acc --training_mode default --seeds 1 2 3 --epochs 100

log "queue10 complete"
