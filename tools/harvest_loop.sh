#!/bin/bash
# Continuous results banking (VERDICT r4 ask #6): every INTERVAL seconds,
# re-harvest logs_r4/ into benchmarks/ROUND4_RESULTS.md and commit it if
# it changed.  A mid-round wipe or round-end cut can no longer erase
# study results — whatever exists at any instant is already committed.
# Path-limited `git commit -- <file>` so concurrent sessions' staged
# work is never swept into these commits.
# Usage: tools/harvest_loop.sh [interval_s] [max_runtime_s]
set -u
cd "$(dirname "$0")/.."
INTERVAL=${1:-300}
MAX=${2:-42000}
start=$(date +%s)
echo $$ > /tmp/harvest_loop.pid
while :; do
  now=$(date +%s)
  [ $((now - start)) -ge "$MAX" ] && { echo "[harvest_loop] max runtime reached"; exit 0; }
  python3 tools/harvest_round4.py >/dev/null 2>&1
  if ! git diff --quiet -- benchmarks/ROUND4_RESULTS.md 2>/dev/null; then
    git commit -m "Bank study results: $(date -u +%H:%M) harvest" \
      -- benchmarks/ROUND4_RESULTS.md >/dev/null 2>&1 \
      && echo "[harvest_loop] committed at $(date -u +%H:%M:%S)"
  fi
  sleep "$INTERVAL"
done
