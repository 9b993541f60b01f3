#!/bin/bash
# Round-3/4 queue, leg 9: complete the dual-ViT canonical-rescue protocol.
#
# Context: the faithful recipe collapses to DINO's uniform fixed point on this
# corpus (root cause closed in PARITY.md); the canonical-protection variant
# (teacher temp 0.07 + 10-epoch LR warmup,
# configs/config_parity_synth_dualvit_canonical.yaml) rescues it to the
# reference's number on seeds 1 and 2 at 30 epochs. This leg:
#   1. seed 3 x 30 epochs  -> full 3-seed rescue row for PARITY.md.
#   2. seed 1 x 100 epochs -> the full-protocol-length canonical number.
# Each job runs under the stall watchdog (kill + bit-exact resume on the
# TPU-relay RPC-stall signature). One chip: jobs strictly sequential.
#
# Durability: git is the ONLY durable store — the disk (including gitignored
# files and /tmp) is re-provisioned fresh at session start. Done-markers under
# runs/.queue_markers and each job's artifacts + rolling `last` checkpoint are
# therefore COMMITTED (scripts/queue_commit.sh) as each job drains; re-running
# this script after a reboot skips done jobs and resumes the in-flight one
# from its committed checkpoint via AVMNIST_RESUME_LAST + AVMNIST_RUN_NAME.
set -u
cd /root/repo
MARKERS=runs/.queue_markers; mkdir -p "$MARKERS"

# Interlock: queue10 waits on this pid (ADVICE r3 — previously nothing wrote it).
echo $$ > /tmp/r3i_queue.pid

Q=/tmp/r3i_queue.log
log() { echo "[queue9 $(date +%H:%M:%S)] $*" >> "$Q"; }

run_job() { # name stale_s cmd...
  local name=$1 stale=$2; shift 2
  local marker=$MARKERS/r3i_done_$name
  if [ -f "$marker" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  scripts/run_with_stall_watchdog.sh "$name" "runs/parity/scratch/$name" "$stale" -- "$@"
  local rc=$?
  log "end $name rc=$rc"
  if [ $rc -eq 0 ]; then
    touch "$marker"
    # Rolling `last` is only for resuming an in-flight run — drop it once the
    # job is done (100 MB of dead weight per run); keep `best` for reevaluate.
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

run_job dualvit_diag_canonical_s3 1500 \
  env AVMNIST_MAX_SCAN_STEPS=64 timeout 7200 \
  python -u run_dino.py --model multi_dual_vit \
    --config configs/config_parity_synth_dualvit_canonical.yaml \
    --metric mlp_acc --training_mode default --seeds 3 --epochs 30

run_job dualvit_canonical_100ep 1500 \
  env AVMNIST_MAX_SCAN_STEPS=64 timeout 18000 \
  python -u run_dino.py --model multi_dual_vit \
    --config configs/config_parity_synth_dualvit_canonical.yaml \
    --metric mlp_acc --training_mode default --seeds 1 --epochs 100

log "queue9 complete"
rm -f /tmp/r3i_queue.pid
