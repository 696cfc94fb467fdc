#!/bin/bash
# Round-4 session-restart orchestration: the environment wiped exp/ and
# data/ again, so this chains the whole study program unattended:
#   corpus synthesis (already running, pid /tmp/data_regen.pid)
#   -> features -> shards
#   -> char-RNNLM train (host CPU, background)
#   -> base flagship retrain (TPU, K=25 — the dispatch length that
#      re-entered the round-3 binding trajectory; see WER_SYNTH round 4)
#   -> wall-clock cutter (CUT_TRAIN_S of train time, then SIGTERM)
#   -> tools/round4_post_base.sh (dev-first study stages, rebasing on
#      the newest checkpoint if the train was cut early)
#
# Everything logs under logs_r4/; each boundary is guarded so a failure
# surfaces in this script's own log instead of cascading.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs_r4

log() { echo "[relaunch $(date +%H:%M:%S)] $*"; }

# 1. wait out corpus synthesis
while p=$(cat /tmp/data_regen.pid 2>/dev/null) && [ -n "$p" ] && kill -0 "$p" 2>/dev/null; do
  sleep 60
done
log "corpus synthesis done"
tail -2 logs_r4/data_regen.log
for s in train dev test; do
  [ -d data/synth_he/$s ] || { log "FATAL: data/synth_he/$s missing"; exit 1; }
done

# 2. features + shards (device frontend)
log "preprocess start"
bash tools/he_study_recipe.sh preprocess > logs_r4/preprocess.log 2>&1 \
  || { log "FATAL: preprocess failed"; tail -5 logs_r4/preprocess.log; exit 1; }
log "shards start"
bash tools/he_study_recipe.sh shards > logs_r4/shards.log 2>&1 \
  || { log "FATAL: create_shards failed"; tail -5 logs_r4/shards.log; exit 1; }
log "shards done"

# 3. char RNNLM on the host CPU, concurrent with the TPU train (the
# lmsweep stage reads result.json, present from the first epoch on)
nohup bash tools/flagship_round4.sh lm > logs_r4/lm_train.log 2>&1 &
log "LM train started (host, pid $!)"

# 4. base flagship train
nohup env EPOCHS=${EPOCHS:-30} K=25 bash tools/he_flagship_100k.sh train \
  > logs_r4/base_train.log 2>&1 &
echo $! > /tmp/base_train.pid
log "base train started (pid $(cat /tmp/base_train.pid))"

# 5. duration cutter + post-base chain (chain waits on the train pid and
# rebases BASE_EPOCH on the newest checkpoint if the cutter fired)
nohup env CUT_SLEEP_S=${CUT_TRAIN_S:-6600} bash tools/round4_cutter.sh \
  > logs_r4/cutter.log 2>&1 &
nohup env BASE_EPOCH=${EPOCHS:-30} FT_EXTRA=${FT_EXTRA:-4} \
  bash tools/round4_post_base.sh > logs_r4/post_base.log 2>&1 &
log "cutter (+${CUT_TRAIN_S:-6600}s) and post-base chain armed"
