#!/bin/bash
# Supervised launcher for flaky-platform training (no reference
# equivalent; the reference assumes a healthy local GPU).
#
#   tools/train_supervised.sh [max_attempts] -- python3 train.py ... \
#       --stall_timeout_s 900
#
# Reruns the command while it exits with one of the RETRYABLE codes:
#   17  stall watchdog abort (utils/watchdog.py: dead tunnel mid-dispatch)
#   18  transient platform failure (utils/platform.py: backend
#       UNAVAILABLE / DEADLINE_EXCEEDED / init failure)
#  137  SIGKILL, in practice the kernel OOM killer
#   21  PLANNED recycle (--recycle_after_steps, utils/memlog.py):
#       relaunched immediately, no backoff, and NOT counted against
#       max_attempts — it is healthy behavior, not a failure
# Any other nonzero exit (a real error: bad flags, missing shards,
# diverged 20) stops immediately — retrying a bug loops forever and
# buries the trace.  Training resumes from the last epoch checkpoint
# automatically (train.py restore-or-init), so each retry continues,
# not restarts.
set -u

max_attempts=24
if [[ "${1:-}" =~ ^[0-9]+$ ]]; then max_attempts=$1; shift; fi
[ "${1:-}" = "--" ] && shift
if [ $# -eq 0 ]; then
  echo "usage: $0 [max_attempts] -- <training command...>" >&2
  exit 2
fi

backoff=60
attempt=1
while :; do
  echo "[train_supervised] attempt $attempt/$max_attempts: $*" >&2
  "$@"
  rc=$?
  case $rc in
    0)  echo "[train_supervised] done" >&2; exit 0 ;;
    21) echo "[train_supervised] planned recycle (rc 21); relaunching" >&2
        sleep 2
        continue ;;   # no attempt consumed, no backoff
    17) echo "[train_supervised] stall watchdog abort (rc 17)" >&2 ;;
    18) echo "[train_supervised] transient platform failure (rc 18)" >&2 ;;
    # 137 = SIGKILL, in practice the kernel OOM killer (observed live: a
    # multi-hour run's host RSS can be pushed over the edge by unrelated
    # co-located work).  A fresh process resuming from the last epoch
    # checkpoint releases all host memory, so retry is the right remedy.
    137) echo "[train_supervised] SIGKILLed (host OOM?); resuming" >&2 ;;
    *)  echo "[train_supervised] non-retryable exit $rc; stopping" >&2
        exit "$rc" ;;
  esac
  if [ "$attempt" -ge "$max_attempts" ]; then break; fi
  attempt=$((attempt + 1))
  echo "[train_supervised] sleeping ${backoff}s before retry" >&2
  sleep "$backoff"
  backoff=$((backoff * 2)); [ "$backoff" -gt 600 ] && backoff=600
done
# NOT 17/18: an outer supervisor using the same contract must not see
# exhaustion as "retry me" and relaunch a hopeless run forever
echo "[train_supervised] gave up after $max_attempts attempts" >&2
exit 19
