#!/bin/bash
# The VALIDATED 12k-corpus recipe behind the headline synthesized-speech
# result (benchmarks/WER_SYNTH.md: greedy dev WER 0.0007 / test 0.0000 at
# epoch 28, held-out speakers): 256-unit LAS (enc 256x3 + 2 stride-2
# convs, dec 256x2, location-aware attention) + joint CTC auxiliary loss
# (--ctc_weight 0.2) on 12,000 formant-synthesized utterances, bf16,
# constant lr 1e-3 until step 9k then halved every 3k steps.  The CTC
# loss is what makes the attention transition deterministic (locks by
# step 1.5k; without it the same recipe lands at 0.0154/0.0106 with
# seed-chaotic transition timing anywhere in 3-10.6k steps — the full
# A/B study is in WER_SYNTH.md).
#
# Stage selection like run.sh:
#   bash tools/synth_12k_recipe.sh [corpus|preprocess|shards|train|eval|final]...
# (no args = all stages; `final` = test-split greedy at the last epoch).
set -e -o pipefail
cd "$(dirname "$0")/.."

stages="${@:-corpus preprocess shards train eval final}"
run_stage() { case " $stages " in *" $1 "*) return 0;; *) return 1;; esac; }

data=data/synth
work=exp/synth12k
mkdir -p $work

common="--unit char --feat_type mfcc --feat_dim 13 --cmvn True
  --train_100hr_corpus_dir $data/train
  --dev_data_dir $data/dev --test_data_dir $data/test
  --feat_dir $work/features --shard_dir $work/shards
  --save_dir $work/model --log_dir $work/log --summary_dir $work/summary"

model="--enc_type cnn --enc_units 256 --num_enc_layers 3
  --num_enc_channels 32 --dec_units 256 --num_dec_layers 2
  --embedding_size 128 --attention_size 128 --mode loc
  --dropout_rate 0.0 --scheduled_sampling False --scan_unroll 4"

if run_stage corpus; then
  echo "=== corpus: 12k train / 400 dev / 400 test, disjoint speakers ==="
  python3 tools/synth_corpus.py --out $data --train_utts 12000 \
    --dev_utts 400 --test_utts 400 --train_speakers 48 --eval_speakers 8
fi

if run_stage preprocess; then
  python3 preprocess.py $common
fi

if run_stage shards; then
  python3 create_shards.py $common
fi

if run_stage train; then
  # 28 epochs x 750 steps; with the CTC auxiliary loss attention locks
  # by ~step 1.5k, so lr decay from 9k is comfortably post-transition
  # (see WER_SYNTH.md "Joint CTC arm")
  python3 train.py $common $model --ctc True --ctc_weight 0.2 \
    --epoch 28 --steps_per_epoch 750 \
    --lr 1e-3 --lr_decay_start 9000 --lr_decay_step 3000 \
    --lr_decay_rate 0.5 --dtype bfloat16 --steps_per_dispatch 16 --stall_timeout_s 900 \
    --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 --max_to_keep 28
fi

if run_stage eval; then
  echo "=== greedy WER trajectory (dev) ==="
  for e in 18 20 22 24 26 28; do
    python3 test.py $common $model --split dev --convert_rate 0.25 \
      --report_cer True --restore_epoch $e | tail -2
  done
fi

if run_stage final; then
  best=${BEST_EPOCH:-28}
  for split in dev test; do
    echo "=== greedy $split @ E$best ==="
    python3 test.py $common $model --split $split --convert_rate 0.25 \
      --report_cer True --restore_epoch $best | tail -2
  done
fi
