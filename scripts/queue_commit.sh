#!/bin/bash
# Durably commit queue artifacts (done-markers, run dirs, rolling checkpoints)
# from a background queue script. Git is the ONLY durable store in this
# environment — the disk (gitignored files included) is re-provisioned fresh at
# every session start, so anything not committed is lost (verified 2026-08-20).
#
#   scripts/queue_commit.sh "<message>" <path> [<path>...]
#
# Paths are staged with `git add -f` (rolling `last` checkpoints may be
# gitignored). Concurrency-safe against the foreground builder session:
# a PRIVATE index file keeps staging separate, and the ref moves via
# compare-and-swap (update-ref <new> <expected-old>), so a foreground commit
# landing mid-flight makes this retry on the new head instead of silently
# reverting it.
set -u
cd /root/repo
MSG=$1; shift
BRANCH=$(git symbolic-ref -q HEAD) || { echo "queue_commit: detached HEAD" >&2; exit 1; }
# Separate var for the trap: the shared-index sync below `unset`s
# GIT_INDEX_FILE, and under `set -u` a trap referencing the unset name dies
# with "unbound variable" (seen in watchdog logs) instead of cleaning up.
QUEUE_IDX=/tmp/queue_git_index_$$
export GIT_INDEX_FILE=$QUEUE_IDX
trap 'rm -f "$QUEUE_IDX"' EXIT
for i in 1 2 3 4 5; do
  BASE=$(git rev-parse "$BRANCH") || { sleep 7; continue; }
  git read-tree "$BASE" 2>/dev/null || { sleep 7; continue; }
  # A missing artifact path must be LOUD: committing just the done-marker
  # would record the job as done while its results are lost on the next
  # disk wipe. Log the error and fail instead of silently dropping paths.
  if ! git add -f -- "$@" 2>&1; then
    echo "queue_commit: git add failed for: $*" >&2
    exit 1
  fi
  if git diff-index --cached --quiet "$BASE" --; then exit 0; fi
  TREE=$(git write-tree) || { sleep 7; continue; }
  NEW=$(git commit-tree "$TREE" -p "$BASE" -m "$MSG") || { sleep 7; continue; }
  if git update-ref "$BRANCH" "$NEW" "$BASE" 2>/dev/null; then
    # Sync the committed paths into the SHARED index too (ADVICE r4, medium):
    # the foreground session's index is a snapshot of the pre-CAS tree, so a
    # later plain `git add <other> && git commit` there would commit a tree
    # WITHOUT these artifact paths — silently deleting them from the tip
    # (this happened: 4fb4ea1 reverted f02f038's artifacts). `git add` takes
    # .git/index.lock itself; retry briefly if the foreground holds it.
    unset GIT_INDEX_FILE
    for j in 1 2 3; do git add -f -- "$@" 2>/dev/null && break; sleep 3; done
    exit 0
  fi
  sleep $(( (RANDOM % 20) + 5 ))
done
echo "queue_commit: failed after 5 tries: $MSG" >&2
exit 1
