#!/bin/bash
# Stall-resilient runner for long TPU protocol runs (ops harness for the
# train/checkpoint.py save_last/resume feature).
#
#   scripts/run_with_stall_watchdog.sh <run_name> <watch_dir> <stale_s> -- cmd...
#
# Launches cmd with AVMNIST_SAVE_LAST_EVERY/AVMNIST_RESUME_LAST set, watches
# the newest file anywhere under <watch_dir> (metrics.csv flushes every epoch;
# the train loop also touches $AVMNIST_HEARTBEAT each epoch, which covers
# phases that write no other files, e.g. hyperparameter-search trials); if it
# goes stale for longer than <stale_s> while the process is alive (the
# TPU-relay RPC-stall signature: main thread parked in futex_do_wait, 0% CPU,
# frozen metrics — observed twice on 2026-08-19), kills it and relaunches. The
# relaunch resumes bit-exactly from the rolling `last` checkpoint (resident
# path). Max 5 relaunches.
set -u
NAME=$1; WATCH=$2; STALE=$3; shift 3
[ "$1" = "--" ] && shift

LOG=/tmp/watchdog_${NAME}.log
say() { echo "[watchdog $(date +%H:%M:%S)] $*" >> "$LOG"; }

# Drop checkpoint debris that a previous kill -9 (5s grace) may have left
# mid-orbax-save; runs before EVERY attempt, since the watchdog itself creates
# such debris when it kills a run (ADVICE r3). Three kinds:
#   - `last`/`best` dirs without orbax's finalize marker (resuming crashes);
#   - `*.orbax-checkpoint-tmp-*` staging dirs (dead weight, confuses find -newer).
# The in-process loaders also validate the marker (checkpoint.is_finalized), so
# this is belt and braces.
clean_ckpt_debris() {
  for d in "$WATCH"/ckpt_seed*/last "$WATCH"/ckpt_seed*/best; do
    if [ -d "$d" ] && [ ! -f "$d/_CHECKPOINT_METADATA" ]; then
      say "dropping unfinalized checkpoint $d"
      rm -rf "$d"
    fi
  done
  find "$WATCH" -maxdepth 3 -name '*.orbax-checkpoint-tmp-*' -exec rm -rf {} + 2>/dev/null
}

for attempt in $(seq 1 6); do
  clean_ckpt_debris
  say "attempt $attempt: $*"
  env AVMNIST_SAVE_LAST_EVERY="${AVMNIST_SAVE_LAST_EVERY:-2}" AVMNIST_RESUME_LAST=1 \
      AVMNIST_RUN_NAME="$NAME" AVMNIST_HEARTBEAT="$WATCH/.heartbeat" \
      "$@" > "/tmp/run_${NAME}_a${attempt}.log" 2>&1 &
  PID=$!
  START=$(date +%s)
  LAST_CKPT_COMMIT=$START
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    LATEST=$(find "$WATCH" -type f -printf '%T@\n' 2>/dev/null | sort -rn | head -1 | cut -d. -f1)
    REF=${LATEST:-$START}
    AGE=$(( $(date +%s) - REF ))
    if [ "$AGE" -gt "$STALE" ]; then
      say "stall: newest file under $WATCH is ${AGE}s old > ${STALE}s — killing $PID for resume"
      kill "$PID" 2>/dev/null; sleep 5
      kill -9 "$PID" 2>/dev/null
      break
    fi
    # Durable MID-RUN resume state (advisor r4 #1): every ~20 min commit the
    # run's finalized rolling `last` checkpoint + logs, so a session reboot
    # (disk re-provisioned; only git survives) resumes the IN-FLIGHT run
    # instead of restarting it. Finalize-marker check skips the save window;
    # queue_commit.sh uses a private index + CAS, safe against the foreground.
    # (20 min balances reboot exposure against repo growth: each commit adds
    # the checkpoint's new orbax blobs to history.)
    if [ $(( $(date +%s) - LAST_CKPT_COMMIT )) -ge 1200 ]; then
      LAST_CKPT_COMMIT=$(date +%s)
      for d in "$WATCH"/ckpt_seed*/last; do
        [ -f "$d/_CHECKPOINT_METADATA" ] || continue
        scripts/queue_commit.sh "Rolling checkpoint: $NAME (mid-run resume state)" \
          "$d" "$WATCH"/logs* >> "$LOG" 2>&1 \
          && say "committed mid-run resume state ($d)"
      done
    fi
  done
  wait "$PID" 2>/dev/null; RC=$?
  say "attempt $attempt exited rc=$RC"
  if [ "$RC" -eq 0 ]; then say "done"; exit 0; fi
done
say "giving up after 6 attempts"
exit 1
