#!/bin/bash
# Round-5 TPU chain: runs after the round-4 post-base study chain
# (tools/round4_post_base.sh, pid /tmp/post_base.pid) releases the chip.
#
#   1. basin_k50   — dead-basin replication (VERDICT r4 ask #4): the
#                    published-size flagship recipe with K=50
#                    steps_per_dispatch — the configuration that hit the
#                    round-4 dead optimization basin (CTC flat,
#                    attention collapsed, 41k steps) — re-run for 15k
#                    steps with training/monitor.py armed WARN-ONLY.
#                    Outcome either replicates the basin (and validates
#                    that loss_plateau/att_collapse fire by ~10k) or
#                    documents a non-replication; both upgrade
#                    WER_SYNTH.md's n=1 correlation.
#   2. bench_recap — fresh driver-bench capture on the now-quiet chip,
#                    seeding benchmarks/bench_cache.json for the
#                    round-end driver run (VERDICT r4 ask #2).
#
# Each stage idles while /tmp/asr_bench_running.lock exists so a bench
# capture window is never contended by this chain (the reciprocal of
# bench.py holding the lock).
set -u
cd "$(dirname "$0")/.."

log() { echo "[r5chain $(date +%H:%M:%S)] $*"; }

wait_bench_lock() {
  local waited=0
  while [ -e /tmp/asr_bench_running.lock ] && [ "$waited" -lt 3600 ]; do
    sleep 20; waited=$((waited + 20))
  done
}

stage() {
  local name=$1; shift
  wait_bench_lock
  log "=== stage $name start ==="
  if "$@" > "logs_r4/$name.log" 2>&1; then
    log "=== stage $name OK ==="
  else
    log "=== stage $name FAILED (exit $?) — continuing ==="
  fi
  tail -4 "logs_r4/$name.log"
}

# 0. wait for the round-4 post-base chain to release the chip
while p=$(cat /tmp/post_base.pid 2>/dev/null) && [ -n "$p" ] \
      && kill -0 "$p" 2>/dev/null; do sleep 60; done
log "round-4 chain done"
tail -2 logs_r4/post_base.log

data=data/synth_he
work=exp/he
common="--unit char --feat_type mfcc --feat_dim 13 --cmvn True
  --train_100hr_corpus_dir $data/train
  --dev_data_dir $data/dev --test_data_dir $data/test
  --feat_dir $work/features --shard_dir $work/shards
  --log_dir $work/log_basin --summary_dir $work/summary_basin"
flagship="--enc_type cnn --enc_units 512 --num_enc_layers 4
  --num_enc_channels 32 --dec_units 1024 --num_dec_layers 2
  --embedding_size 256 --attention_size 128 --mode loc
  --dropout_rate 0.0 --scheduled_sampling False --scan_unroll 4"

# 0b. retry the aug rescue arm: the chain's first attempt died on the
# resume guard (seeded config said audio_shards=False; fixed in
# tools/rescue_study.sh by patching the seed), so the online-
# augmentation arm — the highest-priority rescue remedy — never ran.
stage rescue_aug env BASE_EPOCH=25 FT_EXTRA=4 K=25 \
  bash tools/rescue_study.sh aug
stage rescue_aug_eval env BASE_EPOCH=25 FT_EXTRA=4 EVAL_EPOCH=29 \
  bash tools/rescue_study.sh eval_aug

# 0b2. re-run the ss2 arm's decodes: the first attempt's att-beam
# stalled on a >900 s remote compile and aborted (watchdog 17); the
# eval path now retries with an 1800 s stall budget.
stage rescue_ss2_eval env BASE_EPOCH=25 FT_EXTRA=4 EVAL_EPOCH=29 \
  bash tools/rescue_study.sh eval_ss2

# 0c. re-dump the BASE model's att-only beam hypotheses (the chain's
# later decodes overwrote the shared pred/gt files) and run the error
# decomposition on base + every archived arm: the evidence for the
# published-decode-mode conclusion (VERDICT ask #3).
stage base_attbeam_redump python3 decode.py \
  --unit char --feat_type mfcc --feat_dim 13 --cmvn True \
  --train_100hr_corpus_dir $data/train \
  --dev_data_dir $data/dev --test_data_dir $data/test \
  --feat_dir $work/features --shard_dir $work/shards \
  --log_dir $work/log_attbeam_base --summary_dir $work/summary_f100k \
  --use_saved_config True --scan_unroll 4 --convert_rate 0.25 \
  --report_cer True --save_dir $work/model_f100k --split dev \
  --restore_epoch 25 --beam_size 8 --beam_logprob True \
  --stall_timeout_s 3600
stage attbeam_error_analysis bash -c '
  python3 tools/error_analysis.py \
    --ref exp/he/log_attbeam_base/decode_gt.txt \
    --hyp exp/he/log_attbeam_base/decode_pred.txt --examples 8
  for f in exp/he/log_f100k/attbeam_*_pred.txt; do
    arm=$(basename "$f" _pred.txt)
    echo "=== $arm ==="
    python3 tools/error_analysis.py \
      --ref "${f%_pred.txt}_gt.txt" --hyp "$f" --examples 3
  done'

# 0d. encoder-health probe: CTC-greedy decode of the base checkpoint.
# If CTC alone reads the audio at ~1% WER while att-only beam sits at
# ~60%, the encoder is healthy and the att-only gap is pure decoder
# free-running — the sharpest single piece of evidence for the ask-#3
# conclusion.
stage base_ctcgreedy python3 test.py \
  --unit char --feat_type mfcc --feat_dim 13 --cmvn True \
  --train_100hr_corpus_dir $data/train \
  --dev_data_dir $data/dev --test_data_dir $data/test \
  --feat_dir $work/features --shard_dir $work/shards \
  --log_dir $work/log_f100k --summary_dir $work/summary_f100k \
  --use_saved_config True --scan_unroll 4 --convert_rate 0.25 \
  --report_cer True --save_dir $work/model_f100k --split dev \
  --restore_epoch 25 --eval_decoder ctc_greedy

# 1. basin replication: identical recipe/schedule/seed to the round-4
# incident run (tools/he_flagship_100k.sh with K=50), 15k-step budget —
# the incident's signature was visible well before 15k and the monitor
# is designed to fire by ~10k.  Warn-only (monitor_abort False) so the
# full trajectory is recorded either way.
stage basin_k50 timeout 7200 tools/train_supervised.sh 6 -- \
  python3 train.py $common $flagship \
  --save_dir $work/model_basin_k50 \
  --ctc True --ctc_weight 0.2 \
  --epoch 6 --steps_per_epoch 2500 \
  --lr 1e-3 --lr_decay_start 16000 --lr_decay_step 16000 \
  --lr_decay_rate 0.5 --dtype bfloat16 --steps_per_dispatch 50 \
  --stall_timeout_s 3600 \
  --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 --max_to_keep 8

grep -E "training-health monitor|hostmem" logs_r4/basin_k50.log | tail -20

# 2. fresh bench capture on the quiet chip (also refreshes the
# stale-fallback cache the driver-run bench can serve under contention)
stage bench_recapture env ASR_BENCH_TIMEOUT=2700 python3 bench.py

# 2b. pBLSTM study arm, requeued: the round-4 chain's attempt burned
# supervisor retries on >900 s remote compiles (contended compile
# service); 3600 s stall budget rides out the compile once.
stage pblstm_train bash -c '
  cd /root/repo
  sed "s/--stall_timeout_s 3600/--stall_timeout_s 3600/" \
    tools/pblstm_study.sh > /tmp/pblstm_r5.sh
  bash /tmp/pblstm_r5.sh train'
stage pblstm_eval bash /tmp/pblstm_r5.sh eval
stage pblstm_final bash /tmp/pblstm_r5.sh final
stage pblstm_beam bash /tmp/pblstm_r5.sh beam

# 3. full-dose scheduled-sampling arm (ss2 only reached tf 0.93 in its
# shortened window; ss3 completes the 1.0 -> 0.4 ramp in-budget at the
# stabilized lr — the last untested dose of the reference's own
# anti-exposure-bias mechanism)
stage rescue_ss3 env BASE_EPOCH=25 FT_EXTRA=6 K=25 \
  bash tools/rescue_study.sh ss3
stage rescue_ss3_eval env BASE_EPOCH=25 FT_EXTRA=6 EVAL_EPOCH=31 \
  bash tools/rescue_study.sh eval_ss3

# 3b. dropout rescue arm, requeued (first attempt churned on >900 s
# compiles; rescue_study.sh now carries the 3600 s stall budget)
stage rescue_do env BASE_EPOCH=25 FT_EXTRA=4 K=25 \
  bash tools/rescue_study.sh do
stage rescue_do_eval env BASE_EPOCH=25 FT_EXTRA=4 EVAL_EPOCH=29 \
  bash tools/rescue_study.sh eval_do

# 4. second basin probe at a different seed: is the K=50 basin a
# property of the configuration or of one data order?  (n=3 overall)
stage basin_k50_seed1 timeout 7200 tools/train_supervised.sh 6 -- \
  python3 train.py $common $flagship \
  --save_dir $work/model_basin_k50s1 --seed 1 \
  --ctc True --ctc_weight 0.2 \
  --epoch 6 --steps_per_epoch 2500 \
  --lr 1e-3 --lr_decay_start 16000 --lr_decay_step 16000 \
  --lr_decay_rate 0.5 --dtype bfloat16 --steps_per_dispatch 50 \
  --stall_timeout_s 3600 \
  --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 --max_to_keep 8
grep -E "training-health monitor" logs_r4/basin_k50_seed1.log | tail -8

log "chain complete"
