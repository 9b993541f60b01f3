#!/bin/bash
# Round-4 queue, leg 11 (waits for queue10's done-markers): E2E wall-clock
# re-measure of the two SSL workloads whose end-to-end multiple trails their
# device-throughput multiple (VERDICT r3 #7: info_nce 1.9x E2E vs 4.1x device,
# autoencoder 2.1x vs 6.5x). train/ssl_experiment.py now writes a phase-time
# breakdown (steady train / compile+host / checkpoint / probe hours) into each
# performance summary, so these runs turn the residual into an artifact.
# Reference wall times: info_nce 0.67 h, autoencoder 0.64 h (BASELINE.md).
#
# One chip: waits for BOTH queue10 markers so it never contends with the
# protocol legs. Durability: artifacts committed via scripts/queue_commit.sh.
set -u
cd /root/repo
MARKERS=runs/.queue_markers; mkdir -p "$MARKERS"

Q=/tmp/r4k_queue.log
log() { echo "[queue11 $(date +%H:%M:%S)] $*" >> "$Q"; }

log "waiting on queue10 markers"
while [ ! -f "$MARKERS/r3j_done_multi_central_tuneaug_r3" ] || \
      [ ! -f "$MARKERS/r3j_done_multi_central_refexact_3seed_r3" ]; do
  sleep 60
done
log "queue10 drained"

run_job() { # name artifact_dir stale_s cmd...
  # These SSL runs write under runs/parity/data/other_ssl/<workload>; the
  # watchdog's liveness signal is fit()'s per-epoch $AVMNIST_HEARTBEAT touch
  # inside the watch dir (which must EXIST or the open() silently no-ops and a
  # healthy run gets killed as stale).
  local name=$1 artifacts=$2 stale=$3; shift 3
  local marker=$MARKERS/r4k_done_$name
  if [ -f "$marker" ]; then log "skip $name (done)"; return 0; fi
  mkdir -p "runs/parity/scratch/$name"
  log "start $name: $*"
  scripts/run_with_stall_watchdog.sh "$name" "runs/parity/scratch/$name" "$stale" -- "$@"
  local rc=$?
  log "end $name rc=$rc"
  if [ $rc -eq 0 ]; then
    touch "$marker"
    scripts/queue_commit.sh "Queue: $name complete (artifacts + done-marker)" \
      "$marker" "$artifacts" >> "$Q" 2>&1
  fi
  return $rc
}

run_job info_nce_e2e_r4 runs/parity/data/other_ssl/info_nce 1500 \
  timeout 7200 python -u -m avmnist_tpu.cli.run_ssl \
    --workload info_nce --config configs/config_parity_ssl.yaml \
    --seeds 1 2 3 --late_fusion concat

run_job autoencoder_e2e_r4 runs/parity/data/other_ssl/autoencoder 1500 \
  timeout 7200 python -u -m avmnist_tpu.cli.run_ssl \
    --workload autoencoder --config configs/config_parity_ssl.yaml \
    --seeds 1 2 3

log "queue11 complete"
