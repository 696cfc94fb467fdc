#!/bin/bash
# Subword (CharBPE) LAS end-to-end at scale — the reference's PUBLISHED
# unit (its WER 0.249/0.262 recipe is bpe-5k, run.sh:2-27): every prior
# synthesized-speech study here used --unit char, so this is the missing
# at-scale demonstration of the subword path (train_subword.py ->
# preprocess --unit subword -> shards -> joint-CTC train -> greedy/beam).
#
# Corpus: the HIGH-ENTROPY pseudo-word corpus (~2.9k word types), where
# BPE merges carry real information (on the 320-type hand lexicon BPE
# degenerates to whole words).  BPE size 500 is proportionate to the
# corpus the way 5k is to LibriSpeech's open vocabulary.
# Model/schedule: the validated 256-unit joint-CTC recipe, identical to
# the he-study control arm, so char (he study, WER_SYNTH.md) vs subword
# (this study) differ in the unit alone.
#
# Stages: bash tools/subword_study.sh [corpus|bpe|preprocess|shards|train|eval|final|beam]...
set -e -o pipefail
cd "$(dirname "$0")/.."

stages="${@:-corpus bpe preprocess shards train eval final}"
run_stage() { case " $stages " in *" $1 "*) return 0;; *) return 1;; esac; }

data=data/synth_he
work=exp/subword
mkdir -p $work

common="--unit subword --subword_dir $work/bpe --feat_type mfcc
  --feat_dim 13 --cmvn True
  --train_100hr_corpus_dir $data/train
  --dev_data_dir $data/dev --test_data_dir $data/test
  --feat_dir $work/features --shard_dir $work/shards
  --save_dir $work/model --log_dir $work/log --summary_dir $work/summary"

model="--enc_type cnn --enc_units 256 --num_enc_layers 3
  --num_enc_channels 32 --dec_units 256 --num_dec_layers 2
  --embedding_size 128 --attention_size 128 --mode loc
  --dropout_rate 0.0 --scheduled_sampling False --scan_unroll 4"

if run_stage corpus; then
  # same generator + seed as tools/he_study_recipe.sh: if the he corpus
  # is already on disk this stage is a no-op and the char-vs-subword
  # comparison is on the SAME utterances
  [ -d $data/train ] || python3 tools/synth_corpus.py --out $data \
    --train_utts 12000 --dev_utts 400 --test_utts 400 \
    --train_speakers 48 --eval_speakers 8 --pseudo_words 3000
fi

if run_stage bpe; then
  python3 train_subword.py $common --size 500
fi

if run_stage preprocess; then
  python3 preprocess.py $common
fi

if run_stage shards; then
  python3 create_shards.py $common
fi

if run_stage train; then
  # 12k-recipe schedule (28 x 750 steps); subword sequences are ~3x
  # shorter than char so the decoder scan is cheaper per step
  tools/train_supervised.sh 48 -- \
  python3 train.py $common $model --ctc True --ctc_weight 0.2 \
    --epoch 28 --steps_per_epoch 750 \
    --lr 1e-3 --lr_decay_start 9000 --lr_decay_step 3000 \
    --lr_decay_rate 0.5 --dtype bfloat16 --steps_per_dispatch 16 \
    --stall_timeout_s 900 \
    --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 --max_to_keep 28
fi

if run_stage eval; then
  for ep in 8 16 22 28; do
    python3 test.py $common $model --split dev --restore_epoch $ep \
      --stall_timeout_s 900 \
      --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 \
      | tee $work/eval_dev_E$ep.txt
  done
fi

if run_stage final; then
  python3 test.py $common $model --split test --restore_epoch 28 \
    --stall_timeout_s 900 \
    --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 \
    | tee $work/eval_test_E28.txt
fi

if run_stage beam; then
  # measured-recommended decode (WER_SYNTH.md): joint CTC + logprob beam
  for split in dev test; do
    python3 decode.py $common $model --split $split --restore_epoch 28 \
      --ctc True --ctc_weight 0.2 \
      --beam_size 8 --beam_logprob True --ctc_beam_weight 0.5 \
      --stall_timeout_s 900 | tee $work/beam_${split}_E28.txt
  done
fi

if run_stage train60; then
  # Extended arm, the flagship-100k lesson applied (WER_SYNTH.md
  # "Flagship at 100k steps"): the 28-epoch arm was still improving
  # fast at budget end (greedy dev 1.00->0.52 over E22->E28) with the
  # LR already decayed to 6e-5 — the same frozen-LR-through-binding
  # failure mode.  60 epochs x 750 = 45k steps with the decay
  # stretched to the budget (1e-3 live through 15k, x0.5 every 7.5k).
  tools/train_supervised.sh 48 -- \
  python3 train.py $common $model --ctc True --ctc_weight 0.2 \
    --save_dir $work/model60 --summary_dir $work/summary60 \
    --epoch 60 --steps_per_epoch 750 \
    --lr 1e-3 --lr_decay_start 15000 --lr_decay_step 7500 \
    --lr_decay_rate 0.5 --dtype bfloat16 --steps_per_dispatch 16 \
    --stall_timeout_s 900 \
    --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 --max_to_keep 12
fi

if run_stage eval60; then
  # max_to_keep 12 on the train60 stage retains epochs 49-60 only
  for ep in 50 55 60; do
    python3 test.py $common $model --save_dir $work/model60 \
      --split dev --restore_epoch $ep --stall_timeout_s 900 \
      --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 \
      | tee $work/eval60_dev_E$ep.txt
  done
fi

if run_stage final60; then
  for split in dev test; do
    python3 decode.py $common $model --save_dir $work/model60 \
      --split $split --restore_epoch 60 \
      --ctc True --ctc_weight 0.2 \
      --beam_size 8 --beam_logprob True --ctc_beam_weight 0.5 \
      --stall_timeout_s 900 | tee $work/beam60_${split}_E60.txt
  done
  python3 test.py $common $model --save_dir $work/model60 \
    --split test --restore_epoch 60 --stall_timeout_s 900 \
    --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 \
    | tee $work/eval60_test_E60.txt
  python3 test.py $common $model --save_dir $work/model60 \
    --split dev --restore_epoch 60 \
    --ctc True --ctc_weight 0.2 --eval_decoder ctc_greedy \
    --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 \
    | tee $work/ctcgreedy60_dev_E60.txt
fi

if run_stage ctcprobe; then
  # encoder-health probe: CTC-greedy decode of the same checkpoint
  python3 test.py $common $model --split dev --restore_epoch 28 \
    --ctc True --ctc_weight 0.2 --eval_decoder ctc_greedy \
    --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 \
    | tee $work/ctcgreedy_dev_E28.txt
fi
