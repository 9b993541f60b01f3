#!/bin/bash
# Round-3 serialized TPU job queue (one chip; jobs must not overlap).
#
# Runs the remaining VERDICT r2 protocol work in priority order. Each job is
# bounded by `timeout` and guarded by a done-marker so the queue can be
# re-launched idempotently after a session crash. Logs: /tmp/r3_queue.log and
# /tmp/r3_<job>.log.
set -u
cd /root/repo

Q=/tmp/r3_queue.log
log() { echo "[queue $(date +%H:%M:%S)] $*" >> "$Q"; }

wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 30; done; }

run_job() { # name bound_s cmd...
  local name=$1 bound=$2; shift 2
  local marker=/tmp/r3_done_$name
  if [ -f "$marker" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  timeout "$bound" "$@" > "/tmp/r3_${name}.log" 2>&1
  local rc=$?
  log "end $name rc=$rc"
  [ $rc -eq 0 ] && touch "$marker"
  return $rc
}

# 0. wait for the in-flight dual_vit seed-1 run, if any
if [ -f /tmp/dualvit_s1.pid ]; then
  log "waiting on dual_vit seed1 pid $(cat /tmp/dualvit_s1.pid)"
  wait_pid "$(cat /tmp/dualvit_s1.pid)"
fi

# 1. DINO hybrid training modes, 3 seeds x 100 epochs each (VERDICT r2 item 2)
for mode in mse infonce semi_supervised; do
  run_job "hybrid_${mode}" 10800 \
    python run_dino.py --model multi_central --config configs/config_parity_synth.yaml \
      --metric mlp_acc --training_mode "$mode"
done

# 2. multi_central default re-run, 1 seed, under the new reference-exact
#    defaults (VERDICT r2 item 5 confirmation)
run_job recheck_central 3600 \
  python run_dino.py --model multi_central --config configs/config_parity_synth.yaml \
    --metric mlp_acc --training_mode default --seeds 1

# 3. Tuning study for real (VERDICT r2 item 3): first leg killed mid-study to
#    exercise resume; second leg pins the same run dir (AVMNIST_RUN_NAME) so the
#    study storage is reloaded and only the remaining trials run.
if [ ! -f /tmp/r3_done_optuna ]; then
  export AVMNIST_RUN_NAME=multi_central_tune_mlp_acc_r3
  log "start optuna leg1 (killed at 1200s to test resume)"
  timeout 1200 python run_dino.py --model multi_central \
    --config configs/config_parity_synth_tune.yaml --metric mlp_acc \
    --training_mode default --hyperparameter_tune --seeds 1 \
    > /tmp/r3_optuna_leg1.log 2>&1
  log "optuna leg1 rc=$? (expected 124=killed)"
  run_job optuna 10800 \
    python run_dino.py --model multi_central \
      --config configs/config_parity_synth_tune.yaml --metric mlp_acc \
      --training_mode default --hyperparameter_tune --seeds 1
  unset AVMNIST_RUN_NAME
fi

# 4. dual_vit seeds 2 and 3 (protocol completion; run regardless of outcome —
#    a 3-seed negative result is also evidence)
for s in 2 3; do
  run_job "dualvit_s${s}" 16200 \
    env AVMNIST_MAX_SCAN_STEPS=64 \
    python run_dino.py --model multi_dual_vit --config configs/config_parity_synth.yaml \
      --metric mlp_acc --training_mode default --seeds "$s"
done

log "queue complete"
