#!/usr/bin/env bash
# Snapshot precondition: the FULL test suite must be green before any
# end-of-round snapshot commit. Run this instead of a bare `git commit`
# for snapshots — it refuses on red.
#
#   tools/snapshot_check.sh && git add -A && git commit -m "..."
#
# Background: rounds 8 and 10 were both snapshotted with a red test
# (VERDICT.md round-10 "What's wrong" #1). This script makes the stated
# rule mechanical.
set -u
cd "$(dirname "$0")/.."

log=$(mktemp /tmp/snapshot_check.XXXXXX.log)
echo "snapshot_check: running full sbt test (log: $log)..."
if sbt -batch test >"$log" 2>&1; then
  tail -5 "$log"
  echo "snapshot_check: GREEN — snapshot allowed."
  exit 0
else
  echo "snapshot_check: RED — snapshot REFUSED. Failures:"
  grep -E '^\[error\]|\*\*\* FAILED|Tests: succeeded' "$log" | tail -30
  exit 1
fi
