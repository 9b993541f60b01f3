#!/bin/bash
# Round-5 queue, leg 1 (VERDICT r4 "Next round" #5): dual-ViT at protocol
# scale — canonical config, seeds {2,3} x 100 epochs (the actual evidence
# gap; seed 1 at 100 ep is the committed r4 artifact 74.73/66.57,
# runs/parity/data/dualvit_canonical_100ep). The combined n=3 row vs the
# reference's headline table (Step1.md:6-16: 65.28 +/- 0.12 / 61.00 +/- 0.07)
# is assembled in PARITY.md from both run dirs. NOT --seeds 1 2 3: dual-ViT
# runs ~100 s/epoch (r4 metrics.csv), so 3 seeds x 100 ep ~ 8.4 h — past the
# round budget; 2 seeds ~ 5.6 h fits.
#
# ADVICE r4 (low): checkpoints are DROPPED before the artifact commit — only
# logs/CSVs/summaries go to git; `git add` paths are explicit so .gitignore
# still filters the rest (no blanket `add -f` over the scratch dir).
set -u
cd /root/repo
MARKERS=runs/.queue_markers; mkdir -p "$MARKERS"

Q=/tmp/r5_queue.log
log() { echo "[queue-r5.1 $(date +%H:%M:%S)] $*" >> "$Q"; }

run_job() { # name stale_s cmd...
  local name=$1 stale=$2; shift 2
  local marker=$MARKERS/r5_done_$name
  if [ -f "$marker" ]; then log "skip $name (done)"; return 0; fi
  mkdir -p "runs/parity/scratch/$name"
  log "start $name: $*"
  scripts/run_with_stall_watchdog.sh "$name" "runs/parity/scratch/$name" "$stale" -- "$@"
  local rc=$?
  log "end $name rc=$rc"
  if [ $rc -eq 0 ]; then
    touch "$marker"
    # rolling `last` is only resume state; drop once done. `best` stays on
    # disk for in-session reevaluation but is NOT committed (orbax blobs).
    rm -rf "runs/parity/scratch/$name"/ckpt_seed*/last
    local paths="$marker"
    for p in "runs/parity/scratch/$name"/config.yaml \
             "runs/parity/scratch/$name"/logs_seed* \
             "runs/parity/scratch/$name"/downstream \
             "runs/parity/data/$name"; do
      [ -e "$p" ] && paths="$paths $p"
    done
    scripts/queue_commit.sh "Queue: $name complete (artifacts + done-marker)" \
      $paths >> "$Q" 2>&1
  fi
  return $rc
}

run_job dualvit_canonical_s23_r5 1800 \
  env AVMNIST_MAX_SCAN_STEPS=64 timeout 25000 \
  python -u run_dino.py --model multi_dual_vit \
    --config configs/config_parity_synth_dualvit_canonical.yaml \
    --metric mlp_acc --training_mode default --seeds 2 3 --epochs 100

log "queue-r5.1 complete"
rm -f /tmp/r5_chain.pid
