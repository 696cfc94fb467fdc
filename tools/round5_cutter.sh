#!/bin/bash
# Round-5 safety cutter: at the target UTC time, stop the round-5 chain
# and any training it supervises so the driver's round-end bench.py has
# a quiet chip (the round-4 bench artifact died precisely because a
# builder chain owned the chip in the capture window).
#
# Kill order matters: chain first (no new stages), then supervisors (no
# relaunches), then the python trainers (SIGTERM -> preemption
# checkpoint + clean exit).  All pids come from /proc cmdline scans at
# fire time — never pkill/pgrep patterns (they can match this session).
#
# Usage: tools/round5_cutter.sh [HH:MM-utc, default 12:30]
set -u
TARGET=${1:-12:30}
now=$(date -u +%s)
target=$(date -u -d "today $TARGET" +%s)
[ "$target" -le "$now" ] && { echo "target in the past; exiting"; exit 0; }
echo "cutter armed for $TARGET UTC ($((target - now)) s)"
sleep $((target - now))

collect() {  # collect <substring> -> pids whose cmdline starts with it
  local want=$1 out=""
  for p in /proc/[0-9]*/cmdline; do
    local pid=${p#/proc/}; pid=${pid%/cmdline}
    local c; c=$(tr '\0' ' ' < "$p" 2>/dev/null) || continue
    case "$c" in "$want"*) out="$out $pid";; esac
  done
  echo "$out"
}

chain=$(collect "bash tools/round5_chain.sh")
sups=$(collect "/bin/bash tools/train_supervised.sh")
sups="$sups $(collect "bash tools/train_supervised.sh")"
echo "cutting: chain=[$chain] supervisors=[$sups]"
for pid in $chain; do kill "$pid" 2>/dev/null; done
sleep 1
for pid in $sups; do kill "$pid" 2>/dev/null; done
sleep 1
trains=$(collect "python3 train.py")
decodes="$(collect "python3 decode.py") $(collect "python3 test.py")"
echo "cutting: trains=[$trains] decodes=[$decodes]"
for pid in $trains $decodes; do kill "$pid" 2>/dev/null; done
# trainers checkpoint on SIGTERM; give them a minute, then force
sleep 90
for pid in $trains $decodes; do kill -9 "$pid" 2>/dev/null; done
# final harvest so whatever the cut interrupted is still banked
python3 tools/harvest_round4.py 2>/dev/null
git commit -q -m "Bank study results at round-5 cut" \
  -- benchmarks/ROUND4_RESULTS.md 2>/dev/null
echo "cutter done at $(date -u +%H:%M:%S)"
