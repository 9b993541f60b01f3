#!/bin/bash
# Round-3 queue, leg 9: complete the dual-ViT canonical-rescue protocol.
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
# Durable across session reboots: done-markers live under runs/.queue_markers
# (the disk persists between builder sessions; /tmp does not), and each job
# resumes from its rolling `last` checkpoint via AVMNIST_RESUME_LAST +
# AVMNIST_RUN_NAME run-dir pinning, so re-running this script after a reboot
# continues rather than restarts.
set -u
cd /root/repo
MARKERS=runs/.queue_markers; mkdir -p "$MARKERS"

# Drop any half-written rolling checkpoint (a kill mid-save leaves a `last`
# dir without orbax's finalize marker; resuming from it would crash the run).
for d in runs/parity/scratch/*/ckpt_seed*/last; do
  [ -d "$d" ] && [ ! -f "$d/_CHECKPOINT_METADATA" ] && rm -rf "$d"
done

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
  [ $rc -eq 0 ] && touch "$marker"
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
