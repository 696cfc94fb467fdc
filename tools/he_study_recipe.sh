#!/bin/bash
# Capacity-vs-entropy study on the HIGH-ENTROPY pseudo-word corpus
# (tools/synth_corpus.py --pseudo_words 3000: ~2.9k distinct word types
# vs ~320 in the hand lexicon; benchmarks/WER_SYNTH.md documents that on
# the low-entropy corpus the published-size model never enters its
# attention transition — runs 1-5 — while 256-unit models solve it).
#
# Two arms, BOTH with the recommended joint-CTC recipe and the exact
# schedules of their low-entropy counterparts, so the corpus is the only
# variable:
#   flagship: enc 512x4 + 2 convs, dec 1024x2, loc att   (run-5 schedule)
#   control:  enc 256x3 + 2 convs, dec  256x2, loc att   (12k-recipe schedule)
#
# Stages:
#   bash tools/he_study_recipe.sh [corpus|preprocess|shards|train_f|train_s|eval_f|eval_s|final]...
set -e -o pipefail
cd "$(dirname "$0")/.."

stages="${@:-corpus preprocess shards train_f train_s eval_f eval_s}"
run_stage() { case " $stages " in *" $1 "*) return 0;; *) return 1;; esac; }

data=data/synth_he
work=exp/he
mkdir -p $work

common="--unit char --feat_type mfcc --feat_dim 13 --cmvn True
  --train_100hr_corpus_dir $data/train
  --dev_data_dir $data/dev --test_data_dir $data/test
  --feat_dir $work/features --shard_dir $work/shards
  --log_dir $work/log --summary_dir $work/summary"

flagship="--enc_type cnn --enc_units 512 --num_enc_layers 4
  --num_enc_channels 32 --dec_units 1024 --num_dec_layers 2
  --embedding_size 256 --attention_size 128 --mode loc
  --dropout_rate 0.0 --scheduled_sampling False --scan_unroll 4"

control="--enc_type cnn --enc_units 256 --num_enc_layers 3
  --num_enc_channels 32 --dec_units 256 --num_dec_layers 2
  --embedding_size 128 --attention_size 128 --mode loc
  --dropout_rate 0.0 --scheduled_sampling False --scan_unroll 4"

if run_stage corpus; then
  echo "=== corpus: 12k train / 400 dev / 400 test, 3000 pseudo-words ==="
  python3 tools/synth_corpus.py --out $data --train_utts 12000 \
    --dev_utts 400 --test_utts 400 --train_speakers 48 --eval_speakers 8 \
    --pseudo_words 3000
fi

if run_stage preprocess; then
  python3 preprocess.py $common
fi

if run_stage shards; then
  python3 create_shards.py $common
fi

if run_stage train_f; then
  echo "=== flagship arm (run-5 schedule: lr 1e-3, halved/2k from 2k) ==="
  python3 train.py $common $flagship --save_dir $work/model_f \
    --ctc True --ctc_weight 0.2 \
    --epoch 16 --steps_per_epoch 750 \
    --lr 1e-3 --lr_decay_start 2000 --lr_decay_step 2000 \
    --lr_decay_rate 0.5 --dtype bfloat16 --steps_per_dispatch 16 --stall_timeout_s 900 \
    --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 --max_to_keep 16
fi

if run_stage train_s; then
  echo "=== control arm (12k-recipe schedule: lr 1e-3, halved/3k from 9k) ==="
  python3 train.py $common $control --save_dir $work/model_s \
    --ctc True --ctc_weight 0.2 \
    --epoch 28 --steps_per_epoch 750 \
    --lr 1e-3 --lr_decay_start 9000 --lr_decay_step 3000 \
    --lr_decay_rate 0.5 --dtype bfloat16 --steps_per_dispatch 16 --stall_timeout_s 900 \
    --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 --max_to_keep 28
fi

# eval pulls model flags from each arm's config.json snapshot
# (--use_saved_config; incl. --ctc) — no hand-copied arch blocks to keep
# in sync. --scan_unroll is a perf flag outside the snapshot, so it is
# repeated explicitly.
eval_common="--use_saved_config True --scan_unroll 4
  --convert_rate 0.25 --report_cer True"

if run_stage eval_f; then
  echo "=== flagship greedy WER trajectory (dev) ==="
  for e in 4 8 12 16; do
    python3 test.py $common $eval_common --save_dir $work/model_f \
      --split dev --restore_epoch $e | tail -2
  done
fi

if run_stage eval_s; then
  echo "=== control greedy WER trajectory (dev) ==="
  for e in 8 16 22 28; do
    python3 test.py $common $eval_common --save_dir $work/model_s \
      --split dev --restore_epoch $e | tail -2
  done
fi

if run_stage final; then
  # set BEST_F / BEST_S from the trajectories above
  for split in dev test; do
    echo "=== flagship greedy $split @ E${BEST_F:-16} ==="
    python3 test.py $common $eval_common --save_dir $work/model_f \
      --split $split --restore_epoch ${BEST_F:-16} | tail -2
    echo "=== control greedy $split @ E${BEST_S:-28} ==="
    python3 test.py $common $eval_common --save_dir $work/model_s \
      --split $split --restore_epoch ${BEST_S:-28} | tail -2
  done
fi
