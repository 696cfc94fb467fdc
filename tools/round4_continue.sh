#!/bin/bash
# Slim continuation when corpus+features+shards are produced by an
# already-running he_study_recipe.sh job (pid in /tmp/data_regen.pid):
# waits it out, then runs steps 3-5 of tools/round4_relaunch.sh
# (host LM, base flagship train, duration cutter, post-base chain).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs_r4
log() { echo "[continue $(date +%H:%M:%S)] $*"; }

while p=$(cat /tmp/data_regen.pid 2>/dev/null) && [ -n "$p" ] && kill -0 "$p" 2>/dev/null; do
  sleep 30
done
log "corpus+features+shards job done"
tail -2 logs_r4/data_regen.log
ls exp/he/shards >/dev/null 2>&1 || { log "FATAL: no shards"; exit 1; }

nohup bash tools/flagship_round4.sh lm > logs_r4/lm_train.log 2>&1 &
log "LM train started (host, pid $!)"

nohup env EPOCHS=${EPOCHS:-30} K=25 bash tools/he_flagship_100k.sh train \
  > logs_r4/base_train.log 2>&1 &
echo $! > /tmp/base_train.pid
log "base train started (pid $(cat /tmp/base_train.pid))"

nohup env CUT_SLEEP_S=${CUT_TRAIN_S:-6600} bash tools/round4_cutter.sh \
  > logs_r4/cutter.log 2>&1 &
nohup env BASE_EPOCH=${EPOCHS:-30} FT_EXTRA=${FT_EXTRA:-4} \
  bash tools/round4_post_base.sh > logs_r4/post_base.log 2>&1 &
log "cutter (+${CUT_TRAIN_S:-6600}s) and post-base chain armed"
