#!/bin/bash
# pBLSTM arm makeup runner (round 5): the chain's requeue copied
# pblstm_study.sh to /tmp, where its self-locating `cd $(dirname)/..`
# resolved to / and every stage died on relative paths.  This waits for
# the round-5 chain to release the chip, regenerates the long-stall
# variant IN tools/ (so dirname resolves correctly), and runs the full
# arm.  Each stage checks a hard UTC deadline so nothing launches into
# the driver's round-end bench window (tools/round5_cutter.sh is the
# backstop for anything already running).
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-12:10}

log() { echo "[pblstm_makeup $(date +%H:%M:%S)] $*"; }

past_deadline() {
  [ "$(date -u +%s)" -ge "$(date -u -d "today $DEADLINE" +%s)" ]
}

stage() {
  local name=$1; shift
  if past_deadline; then log "skip $name: past $DEADLINE UTC"; return; fi
  while [ -e /tmp/asr_bench_running.lock ]; do sleep 20; done
  log "=== stage $name start ==="
  if "$@" > "logs_r4/$name.log" 2>&1; then
    log "=== stage $name OK ==="
  else
    log "=== stage $name FAILED (exit $?) — continuing ==="
  fi
  tail -3 "logs_r4/$name.log"
}

while p=$(cat /tmp/r5chain.pid 2>/dev/null) && [ -n "$p" ] \
      && kill -0 "$p" 2>/dev/null; do sleep 60; done
log "round-5 chain done; starting pBLSTM arm"

sed "s/--stall_timeout_s 900/--stall_timeout_s 3600/" \
  tools/pblstm_study.sh > tools/pblstm_r5.sh
chmod +x tools/pblstm_r5.sh

stage pblstm_train bash tools/pblstm_r5.sh train
stage pblstm_eval bash tools/pblstm_r5.sh eval
stage pblstm_final bash tools/pblstm_r5.sh final
stage pblstm_beam bash tools/pblstm_r5.sh beam
python3 tools/harvest_round4.py
log "makeup complete"
