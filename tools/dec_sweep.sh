#!/bin/bash
# Decoder-size sweep at 100k steps (round 4, VERDICT ask #1 fallback).
#
# The flagship (enc 512x4 + 2 convs, dec 1024x2 — the reference's
# published size, /root/reference/run.sh:59-76) decodes at 0.55 WER in
# the reference's published decode mode (attention-only beam-8) on the
# high-entropy synthetic corpus even after 100k steps, while every
# smaller-decoder recipe converges.  WER_SYNTH.md's diagnosis is
# "exposure bias at a decoder scale the corpus cannot discipline" — a
# capacity claim that has never been isolated: the converging arms also
# had smaller ENCODERS and shorter schedules.
#
# This sweep isolates the decoder: identical corpus, shards, encoder
# (512x4 + 2 convs), schedule (lr 1e-3, x0.5 every 16k from 16k),
# batch, step budget (40 x 2500 = 100k), joint-CTC weight — only
# --dec_units changes, 1024 -> 512.  If dec-512 free-runs (attention
# greedy/beam << 0.55) where dec-1024 plateaued, "corpus entropy cannot
# discipline a 1024x2 decoder" becomes a measurement, not a diagnosis.
#
# Stages: bash tools/dec_sweep.sh [train|eval|beam|final]...
set -e -o pipefail
cd "$(dirname "$0")/.."

stages="${@:-train eval}"
run_stage() { case " $stages " in *" $1 "*) return 0;; *) return 1;; esac; }

data=data/synth_he
work=exp/he
model=$work/model_dec512

common="--unit char --feat_type mfcc --feat_dim 13 --cmvn True
  --train_100hr_corpus_dir $data/train
  --dev_data_dir $data/dev --test_data_dir $data/test
  --feat_dir $work/features --shard_dir $work/shards
  --log_dir $work/log_dec512 --summary_dir $work/summary_dec512"

# flagship encoder, HALVED decoder — the only delta vs he_flagship_100k.sh
arm="--enc_type cnn --enc_units 512 --num_enc_layers 4
  --num_enc_channels 32 --dec_units 512 --num_dec_layers 2
  --embedding_size 256 --attention_size 128 --mode loc
  --dropout_rate 0.0 --scheduled_sampling False --scan_unroll 4"

if run_stage train; then
  # EPOCHS/K envs mirror he_flagship_100k.sh: the wiped-disk round-4
  # retrain cuts both runs at the SAME epoch so the dec-512-vs-1024
  # comparison stays budget-matched even when wall-clock forces < 40.
  epochs=${EPOCHS:-40}
  k=${K:-50}
  echo "=== dec-512 sweep arm: $epochs epochs x 2500 steps (K=$k) ==="
  tools/train_supervised.sh 48 -- \
    python3 train.py $common $arm --save_dir $model \
      --ctc True --ctc_weight 0.2 \
      --epoch $epochs --steps_per_epoch 2500 \
      --lr 1e-3 --lr_decay_start 16000 --lr_decay_step 16000 \
      --lr_decay_rate 0.5 --dtype bfloat16 --steps_per_dispatch $k \
      --stall_timeout_s 900 \
      --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 --max_to_keep 40
fi

eval_common="--use_saved_config True --scan_unroll 4
  --convert_rate 0.25 --report_cer True"

if run_stage eval; then
  echo "=== dec-512: greedy WER trajectory (dev) ==="
  for e in 6 12 18 24 30 36 40; do
    python3 test.py $common $eval_common --save_dir $model \
      --split dev --restore_epoch $e | tail -2
  done
fi

if run_stage beam; then
  e=${EVAL_EPOCH:-40}
  echo "=== dec-512 epoch $e: ATTENTION-ONLY beam-8 (dev) — published mode ==="
  python3 decode.py $common $eval_common --save_dir $model \
    --split dev --restore_epoch $e --beam_size 8 --beam_logprob True \
    --stall_timeout_s 900 | tail -3
  echo "=== dec-512 epoch $e: joint-CTC beam-8 (dev) ==="
  python3 decode.py $common $eval_common --save_dir $model \
    --split dev --restore_epoch $e --beam_size 8 --beam_logprob True \
    --ctc_beam_weight 0.5 --stall_timeout_s 900 | tail -3
fi

if run_stage final; then
  echo "=== dec-512: greedy + att-only beam (held-out test), epoch 40 ==="
  python3 test.py $common $eval_common --save_dir $model \
    --split test --restore_epoch 40 | tail -2
  python3 decode.py $common $eval_common --save_dir $model \
    --split test --restore_epoch 40 --beam_size 8 --beam_logprob True \
    --stall_timeout_s 900 | tail -3
fi
