#!/bin/bash
# Round-4 wall-clock cutter: at CUT_AT (HH:MM, local/UTC of `date`),
# gracefully stop the running base train so the post-base chain gets its
# TPU window.  SIGTERM makes train.py save a preemption checkpoint and
# exit 0 (the supervisor treats 0 as completed), the chain's wait loop
# sees the wrapper pid die and proceeds on the newest epoch.
# PID-exact by construction: walks /tmp/base_train.pid's process tree —
# never pattern-matches command lines.
set -u
# Two trigger modes: CUT_SLEEP_S (duration; robust across midnight) wins
# over CUT_AT (HH:MM string compare — same-day only).
if [ -n "${CUT_SLEEP_S:-}" ]; then
  sleep "$CUT_SLEEP_S"
else
  CUT_AT=${CUT_AT:-11:15}
  while [ "$(date +%H:%M)" \< "$CUT_AT" ]; do sleep 20; done
fi
wrapper=$(cat /tmp/base_train.pid 2>/dev/null) || exit 0
kill -0 "$wrapper" 2>/dev/null || { echo "base train already done"; exit 0; }
# wrapper(nohup bash he_flagship_100k.sh) -> train_supervised.sh -> train.py
sup=$(ps -o pid= --ppid "$wrapper" | head -1 | tr -d ' ')
tr_pid=$(ps -o pid= --ppid "${sup:-0}" | head -1 | tr -d ' ')
echo "cutting base train at $(date +%H:%M:%S): wrapper=$wrapper sup=$sup train=$tr_pid"
[ -n "$tr_pid" ] && kill -TERM "$tr_pid"
# give the preemption save up to 3 min, then check
for _ in $(seq 18); do kill -0 "$wrapper" 2>/dev/null || break; sleep 10; done
echo "base train wrapper gone: $(kill -0 "$wrapper" 2>/dev/null && echo no || echo yes)"
