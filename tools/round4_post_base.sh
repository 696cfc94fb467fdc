#!/bin/bash
# Round-4 post-base TPU chain: waits for the 30-epoch base flagship
# retrain (logs_r4/base_train.log, pid /tmp/base_train.pid), then runs
# the remaining VERDICT round-3 asks in value-per-minute order so a
# wall-clock cutoff still leaves completed, interpretable stages:
#
#   1. base anchors  greedy / ATT-ONLY beam-8 / joint-CTC beam-8 (dev)
#                    + greedy and joint beam on held-out test.  The
#                    att-only number is the published-decode-mode anchor
#                    every rescue arm is read against
#                    (/root/reference/run.sh:79-93).
#   2. avg           checkpoint-average e$((BASE_EPOCH-8))..e$BASE_EPOCH + the same three dev
#                    decodes (VERDICT ask #7)
#   3. lmsweep       LM shallow fusion composed with joint-CTC beam-8,
#                    lambda in {0.05,0.1,0.3} on dev (ask #4)
#   4. rescue aug    online noise+speed fine-tune arm (ask #1a)
#   5. rescue ss2    gentle scheduled-sampling arm (ask #1b)
#   6. pblstm        pyramidal-Listener study arm (ask #5)
#   7. rescue do     dropout arm (ask #1c)
#   8. lmtest        best-lambda fusion on test
#
# Each stage logs to logs_r4/<stage>.log and is guarded so one failure
# does not kill the stages after it.
set -u
cd "$(dirname "$0")/.."
export BASE_EPOCH=${BASE_EPOCH:-22}
export FT_EXTRA=${FT_EXTRA:-4}
export K=25   # dispatch-stack length for fine-tune arms (see WER_SYNTH round-4 note)
FT_EPOCH=$((BASE_EPOCH + FT_EXTRA))

log() { echo "[post_base $(date +%H:%M:%S)] $*"; }

stage() {  # stage <name> <cmd...>
  local name=$1; shift
  log "=== stage $name start ==="
  if "$@" > "logs_r4/$name.log" 2>&1; then
    log "=== stage $name OK ==="
  else
    log "=== stage $name FAILED (exit $?) — continuing ==="
  fi
  tail -4 "logs_r4/$name.log"
}

# 0. wait for the base train to finish
while kill -0 "$(cat /tmp/base_train.pid)" 2>/dev/null; do sleep 30; done
log "base train done"
tail -2 logs_r4/base_train.log

# If wall-clock cut the train short, rebase every stage on the newest
# checkpoint that actually exists (each epoch saves, so any prefix works).
latest=$(ls exp/he/model_f100k 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
if [ -n "$latest" ] && [ "$latest" -lt "$BASE_EPOCH" ]; then
  log "train cut early: rebasing stages on epoch $latest (wanted $BASE_EPOCH)"
  export BASE_EPOCH=$latest
  FT_EPOCH=$((BASE_EPOCH + FT_EXTRA))
fi

data=data/synth_he
work=exp/he
model=$work/model_f100k
common="--unit char --feat_type mfcc --feat_dim 13 --cmvn True
  --train_100hr_corpus_dir $data/train
  --dev_data_dir $data/dev --test_data_dir $data/test
  --feat_dir $work/features --shard_dir $work/shards
  --log_dir $work/log_f100k --summary_dir $work/summary_f100k"
eval_common="--use_saved_config True --scan_unroll 4
  --convert_rate 0.25 --report_cer True"

# 1. base anchors at e30
stage base_greedy_dev python3 test.py $common $eval_common \
  --save_dir $model --split dev --restore_epoch $BASE_EPOCH
stage base_attbeam_dev python3 decode.py $common $eval_common \
  --save_dir $model --split dev --restore_epoch $BASE_EPOCH --beam_size 8 \
  --beam_logprob True --stall_timeout_s 900
stage base_jointbeam_dev python3 decode.py $common $eval_common \
  --save_dir $model --split dev --restore_epoch $BASE_EPOCH --beam_size 8 \
  --beam_logprob True --ctc_beam_weight 0.5 --stall_timeout_s 900

# 2. checkpoint averaging (ask #7)
stage avg bash tools/flagship_round4.sh avg
stage avg_eval bash tools/flagship_round4.sh avg_eval

# 3. LM fusion composed with joint-CTC (ask #4) — LM trainer runs on
# the host CPU and started hours before us; result.json appears with
# the first epoch, so any completed state decodes
stage lmsweep bash tools/flagship_round4.sh lmsweep

# 3b. held-out-test anchors (after the dev story is complete)
stage base_greedy_test python3 test.py $common $eval_common \
  --save_dir $model --split test --restore_epoch $BASE_EPOCH
stage base_jointbeam_test python3 decode.py $common $eval_common \
  --save_dir $model --split test --restore_epoch $BASE_EPOCH --beam_size 8 \
  --beam_logprob True --ctc_beam_weight 0.5 --stall_timeout_s 900

# 4-5. rescue arms, highest-priority first (ask #1)
stage rescue_aug bash tools/rescue_study.sh aug_prep aug
stage rescue_aug_eval env EVAL_EPOCH=$FT_EPOCH bash tools/rescue_study.sh eval_aug
stage rescue_ss2 bash tools/rescue_study.sh ss2
stage rescue_ss2_eval env EVAL_EPOCH=$FT_EPOCH bash tools/rescue_study.sh eval_ss2

# 6. pBLSTM study arm (ask #5)
stage pblstm_train bash tools/pblstm_study.sh train
stage pblstm_eval bash tools/pblstm_study.sh eval

# 7-8. lower-priority tail
stage rescue_do bash tools/rescue_study.sh do
stage rescue_do_eval env EVAL_EPOCH=$FT_EPOCH bash tools/rescue_study.sh eval_do
stage lmtest bash tools/flagship_round4.sh lmtest

log "chain complete"
